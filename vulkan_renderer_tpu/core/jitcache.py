"""Persistent XLA compilation cache (OPT-IN; broken on `axon`).

Frame compiles at Bistro-class scale take minutes on the tunneled TPU;
a persistent cache would make every process after the first cheap,
mirroring the reference's on-disk Vulkan pipeline cache role.

MEASURED CAVEAT (2026-08-17): on the experimental `axon` TPU platform a
cache HIT hangs the process (the second bench run never finished
deserializing and blew a 15-minute timeout, while the cold run takes
~7 minutes total). Do NOT enable this for axon runs until the platform
matures; it is safe and useful for the CPU backend.
"""

from __future__ import annotations

import os


def enable(directory: str | None = None,
           min_compile_seconds: float = 5.0) -> str:
    import jax

    if directory is None:
        directory = os.environ.get(
            "VRT_JAX_CACHE",
            os.path.join(os.path.dirname(__file__), "..", "..",
                         ".jax_cache"))
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", directory)
    # Cache anything that took meaningful compile time.
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_seconds)
    return directory
