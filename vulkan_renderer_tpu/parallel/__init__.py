"""Multi-chip scaling: image-tile data parallelism over a jax.sharding.Mesh."""
