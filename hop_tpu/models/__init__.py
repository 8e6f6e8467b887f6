"""flax.linen model zoo mirroring the reference's model/ directory."""
