"""Plan-level utilities: checkpointing, lineage manifests, session config."""
