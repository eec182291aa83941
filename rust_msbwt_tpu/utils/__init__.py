"""Host utilities: npy container IO, FASTX parsing, test oracles, telemetry."""
