"""Multi-chip execution: particle-axis sharding over a jax.sharding.Mesh."""
