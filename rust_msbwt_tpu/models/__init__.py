"""BWT model types: the static query engine (RleBWT) and the dynamic
construction engine (DynamicBWT)."""
