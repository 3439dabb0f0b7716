"""vulkan_renderer_tpu — a TPU-native rebuild of MomentsInGraphics/vulkan_renderer.

A from-scratch JAX/XLA/Pallas renderer for scenes lit by convex polygonal
area lights, implementing projected-solid-angle importance sampling
(SIGGRAPH 2021), LTC-based specular sampling, optimal multiple importance
sampling and BVH-traced shadow rays — re-designed for TPU hardware rather
than ported from the Vulkan/GLSL reference.

Layer map (mirrors SURVEY.md of the reference):
  ops/          pure sampling/shading math (reference: src/shaders/*.glsl)
  assets/       binary formats: .vks scenes, .vkt textures, LTC tables,
                noise tables, quicksaves (reference: scene.c, textures.c, ...)
  scene/        camera + polygonal light derivations (reference: camera.c,
                polygonal_light.c)
  render/       visibility/shading passes, BVH, frame pipeline
                (reference: main.c render passes)
  parallel/     multi-chip image-tile sharding over jax.sharding.Mesh
  experiments/  the paper's experiment harness (reference: experiment_list.c)
  tools/        scene/texture exporters (reference: tools/)
"""

__version__ = "0.1.0"

MAX_POLYGONAL_LIGHT_VERTEX_COUNT = 7
# After clipping a convex polygon against one plane, at most one extra vertex
# appears (reference: polygon_clipping.glsl contract).
MAX_POLYGON_VERTEX_COUNT = MAX_POLYGONAL_LIGHT_VERTEX_COUNT + 1
