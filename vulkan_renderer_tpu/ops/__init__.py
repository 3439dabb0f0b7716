"""Pure math kernels: sampling, clipping, BRDFs, LTC, MIS, noise access.

These are the TPU equivalents of the reference's GLSL kernel library
(src/shaders/*.glsl). Everything is written as pure jnp functions over
unbatched inputs; batch over pixels/samples with jax.vmap (XLA vectorizes
onto the VPU/MXU) or call from Pallas kernels.
"""
