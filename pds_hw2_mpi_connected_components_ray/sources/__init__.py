"""Dataset sources/sinks: Parquet pages/edges readers, the deterministic
sf-table edge derivation, and the reference-format (.mtx/.bin)
conformance codecs."""
