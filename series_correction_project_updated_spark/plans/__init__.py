"""End-to-end jobs: pipeline, checkpointing, resume."""
