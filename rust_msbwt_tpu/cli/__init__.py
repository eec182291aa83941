"""CLI layer: msbwt2-build / msbwt2-convert equivalents
(ref: src/bin/msbwt2-build.rs, src/bin/msbwt2-convert.rs)."""
