"""Sources & sinks: partition-pruned parquet scans, the metadata
direct-path resolver, bypass copies, and catalog registration
(SURVEY §2.1 S1-S9)."""
