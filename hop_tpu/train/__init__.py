"""Per-model jitted train steps and the shared epoch loop."""
