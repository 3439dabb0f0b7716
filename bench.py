"""Benchmark driver: renders the flagship config and prints ONE JSON line.

Metric (BASELINE.json): ms/frame for 1 spp shading + ray-traced shadows on
a Bistro-class scene. The Bistro itself is a separate asset download; until
it is present under data/, the procedural city stand-in (several hundred
thousand triangles, BVH path) is used at the same resolution class.

Measurement follows the reference protocol: warmup, then median over
repeated frames (frame_timer.c:47-72).
"""

import argparse
import json
import os
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--width", type=int, default=960)
    parser.add_argument("--height", type=int, default=540)
    parser.add_argument("--frames", type=int, default=5)
    parser.add_argument("--spp", type=int, default=1)
    parser.add_argument("--scene", default="city")
    parser.add_argument("--buildings", type=int, default=300)
    parser.add_argument("--detail", type=int, default=10,
                        help="face subdivision; tris ~= buildings*90*"
                             "(detail/3)^2 (default: ~300k, Bistro-class)")
    parser.add_argument("--no-shadows", action="store_true")
    parser.add_argument("--chunk-rows", type=int, default=16,
                        help="rays per trace chunk / 128")
    parser.add_argument("--shadow-chunk-rows", type=int, default=None,
                        help="shadow megabatch chunk rows (default: "
                             "--chunk-rows)")
    parser.add_argument("--primary-budget", type=int, default=64)
    parser.add_argument("--shadow-budget", type=int, default=48)
    parser.add_argument("--primary-sc", type=int, default=32,
                        help="primary supercluster cull budget")
    parser.add_argument("--shadow-sc", type=int, default=None,
                        help="shadow supercluster cull budget (default: "
                             "~10%% of the scene's supercluster count, "
                             "min 16 — a FLAT 16 left 16%% of shadow rays "
                             "unproven at the 1M-tri city and the re-trace "
                             "capacity could not absorb them)")
    parser.add_argument("--materials", type=int, default=6,
                        help="city material count (texture-atlas pressure; "
                             "Bistro-class scenes carry hundreds)")
    parser.add_argument("--cluster-size", type=int, default=64,
                        help="triangles per traversal cluster")
    parser.add_argument("--retrace-factor", type=int, default=2,
                        help="exactness re-trace budget multiplier "
                             "(1 disables the second pass)")
    parser.add_argument("--retrace-frac", type=int, default=32,
                        help="shadow re-trace ray capacity = rays//frac; "
                             "the exhaustive cull pays on every slot, so "
                             "this should track the unproven rate (~1% at "
                             "the flagship)")
    parser.add_argument("--retrace-closest-frac", type=int, default=64,
                        help="primary re-trace ray capacity divisor "
                             "(unproven rate ~0.2% at the flagship)")
    parser.add_argument("--seed-closest-sc", type=int, default=None,
                        help="occlusion-seed supercluster budget for the "
                             "primary trace (None = off): a cheap pass "
                             "over the N nearest superclusters bounds the "
                             "main cull's per-ray t_max with real hits")
    parser.add_argument("--seed-shadow-sc", type=int, default=None,
                        help="occlusion-seed budget for the shadow "
                             "megabatch (None = off)")
    parser.add_argument("--seed-items", type=int, default=24,
                        help="seed-pass per-chunk item capacity")
    parser.add_argument("--raster", action="store_true",
                        help="primary visibility via rasterizer-style "
                             "screen-space cluster binning (exact "
                             "coverage, no supercluster budget)")
    parser.add_argument("--attr-filter", action="store_true",
                        help="attribute pass runs over only the clusters "
                             "holding some ray's winning primitive "
                             "(stale-fixup repairs capacity drops)")
    parser.add_argument("--attr-avg-items", type=int, default=8)
    parser.add_argument("--retrace-mid-sc", type=int, default=None,
                        help="escalating shadow re-trace: mid-tier "
                             "supercluster budget before the exhaustive "
                             "pass (default: single exhaustive tier)")
    parser.add_argument("--pipelined-reps", type=int, default=3,
                        help="max repeats of the pipelined loop (min wins; "
                             "stops early once a rep passes the <=1.2x "
                             "sync-latency contention cross-check)")
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend (jax.config.update "
                             "before first use; env vars are too late "
                             "once sitecustomize imported jax)")
    parser.add_argument("--traversal", default="wavefront",
                        choices=["wavefront", "pallas", "bruteforce"],
                        help="'pallas' forces the Pallas tracers even on "
                             "CPU (interpret mode — slow, used by the "
                             "exactness-gate test)")
    parser.add_argument("--stop-after", default=None,
                        choices=["rays", "trace", "noise", "preamble",
                                 "shade", "shadowrays", "shadow"],
                        help="in-frame stage profiling: truncate the frame "
                             "after this stage (run one stage per process; "
                             "the axon platform wedges on multiple large "
                             "programs)")
    args = parser.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from vulkan_renderer_tpu.core.settings import (PolygonSamplingTechnique,
                                                   RenderSettings,
                                                   SamplingStrategy)
    from vulkan_renderer_tpu.render.pipeline import (make_frame_constants,
                                                     render_frame_jit)
    from vulkan_renderer_tpu.render.shading import SceneStatic
    from vulkan_renderer_tpu.scene.camera import FirstPersonCamera
    from vulkan_renderer_tpu.scene.lights import PolygonalLightSpec
    from vulkan_renderer_tpu.scene.scene import load_scene
    from vulkan_renderer_tpu.tools.city import write_city_scene

    os.makedirs("data", exist_ok=True)
    # Scale-tagged filename: changing --buildings/--detail must regenerate,
    # not silently reuse a smaller cached scene (VERDICT r1 weak #4).
    stem = f"{args.scene}_{args.buildings}x{args.detail}" + (
        f"_m{args.materials}" if args.materials != 6 else "")
    vks = os.path.join("data", f"{stem}.vks")
    if not os.path.exists(vks):
        vks = write_city_scene("data", stem, n_buildings=args.buildings,
                               detail=args.detail,
                               n_materials=args.materials)

    # Street lantern lights along the road.
    lights = []
    for i in range(4):
        lights.append(PolygonalLightSpec(
            translation=np.array([-30.0 + 20.0 * i, 0.0, 8.0], np.float32),
            rotation_angles=np.array([np.pi, 0.0, 0.0], np.float32),
            scaling_x=1.5, scaling_y=1.5,
            radiant_flux=np.array([400.0, 380.0, 340.0], np.float32)))
    scene = load_scene(vks, os.path.join("data", f"{stem}_textures"),
                       lights, cluster_size=args.cluster_size)
    # shadow_sc None = auto-sized from the scene's supercluster count
    # inside SceneStatic.resolved_shadow_sc (VERDICT r4 #7: arbitrary
    # scenes run exact without hand flags; the CLI remains an override).
    static = SceneStatic(light_count=len(lights),
                         light_texturing=tuple(0 for _ in lights),
                         light_vertex_counts=tuple(
                             l.vertex_count for l in lights),
                         traversal=args.traversal,
                         trace_chunk_rows=args.chunk_rows,
                         shadow_chunk_rows=args.shadow_chunk_rows,
                         primary_m_budget=args.primary_budget,
                         shadow_m_budget=args.shadow_budget,
                         primary_sc_budget=args.primary_sc,
                         shadow_sc_budget=args.shadow_sc,
                         retrace_factor=args.retrace_factor,
                         retrace_shadow_frac=args.retrace_frac,
                         retrace_closest_frac=args.retrace_closest_frac,
                         retrace_mid_sc=args.retrace_mid_sc,
                         seed_closest_sc=args.seed_closest_sc,
                         seed_shadow_sc=args.seed_shadow_sc,
                         seed_items=args.seed_items,
                         primary_raster=args.raster,
                         attr_item_filter=args.attr_filter,
                         attr_avg_items=args.attr_avg_items)
    camera = FirstPersonCamera(
        position_world_space=np.array([0.0, 0.0, 2.0], np.float32),
        rotation_x=0.55 * np.pi, rotation_z=0.5 * np.pi)
    settings = RenderSettings(
        sampling_strategy=SamplingStrategy.DIFFUSE_SPECULAR_MIS,
        polygon_sampling_technique=PolygonSamplingTechnique.PROJECTED_SOLID_ANGLE,
        sample_count=args.spp,
        trace_shadow_rays=not args.no_shadows)
    constants = make_frame_constants(
        camera, args.width, args.height, settings,
        (np.arange(4) * 0x123456).astype(np.uint32))

    def run_frame(retries=2):
        # ONE jit signature for warmup and the timed loop (with_stats is a
        # static arg: a second signature means a second multi-minute
        # compile and doubles resident executables). np.asarray is the
        # sync point; block_until_ready does not reliably block through
        # the axon relay. A faulted kernel wedges the relay for ~60-90 s
        # and surfaces as a spurious runtime error on a healthy
        # executable; retry after a cooldown (CLAUDE.md).
        for attempt in range(retries + 1):
            try:
                img, stats = render_frame_jit(scene, static, settings,
                                              constants, args.width,
                                              args.height, with_stats=True,
                                              stop_after=args.stop_after)
                return np.asarray(img), stats
            except Exception:
                if attempt == retries:
                    raise
                time.sleep(95)

    img, stats = run_frame()
    uncertain = int(stats.primary_uncertain)
    overflow = int(stats.shadow_overflow)
    times = []
    for _ in range(args.frames):
        t0 = time.perf_counter()
        img, _ = run_frame()
        times.append((time.perf_counter() - t0) * 1000.0)
    latency_ms = float(np.median(times))
    # Pipelined throughput — the reference's protocol: its frame timer
    # medians over frames rendered with multiple frames in flight
    # (frame_timer.c + the fence ring, main.c:2197-2269), so host-device
    # transfer overlaps compute. Dispatch all frames asynchronously with
    # per-frame noise constants, then block once.
    # Frames stay ON DEVICE like the reference's swapchain images (it
    # never reads frames back to host); the sync point per frame is a
    # 4-byte luminance-sum download, so the measurement is device
    # throughput, not the axon relay's (highly variable) 6 MB/frame
    # image-download bandwidth.
    import jax.numpy as jnp
    from vulkan_renderer_tpu.assets.noise import advance_noise_random_numbers
    n_pipe = max(args.frames * 2, 6)

    def pipelined_run(seed):
        frames = []
        t0 = time.perf_counter()
        for _ in range(n_pipe):
            seed, rnd = advance_noise_random_numbers(seed, True)
            c = make_frame_constants(camera, args.width, args.height,
                                     settings, rnd)
            frames.append(jnp.sum(render_frame_jit(
                scene, static, settings, c, args.width, args.height,
                with_stats=True, stop_after=args.stop_after)[0]))
            if len(frames) > 3:
                np.asarray(frames.pop(0))  # bounded in-flight queue
        for f in frames:
            np.asarray(f)
        return (time.perf_counter() - t0) * 1000.0 / n_pipe

    # Contention guard (VERDICT r4 weak #1): the pipelined number is
    # host-dispatch-bound — a concurrent CPU process starved the dispatch
    # threads and BENCH_r04 recorded 1342 ms for a frame whose sync
    # latency was 477 ms (the best ever measured). Pipelined throughput
    # with 3 frames in flight can never legitimately exceed sync latency
    # (overlap only removes time); allow 1.2x for relay jitter. Run the
    # loop up to `--pipelined-reps` times, keep the min, and flag the
    # record as contended if even the min fails the cross-check so a
    # loaded host can no longer silently write a 4x number.
    reps = []
    for rep in range(args.pipelined_reps):
        reps.append(pipelined_run(3124705 + rep * 7919))
        if reps[-1] <= 1.2 * latency_ms:
            break
        time.sleep(2.0)
    ms = min(reps)
    contended = ms > 1.2 * latency_ms
    try:
        loadavg = round(os.getloadavg()[0], 2)
    except OSError:
        loadavg = None
    # Normalize to the 1080p north-star target (20 ms/frame, BASELINE.json):
    # scale measured ms to full-HD pixel count so the ratio is comparable
    # across bench resolutions.
    scale = (1920 * 1080) / (args.width * args.height)
    ms_1080p = ms * scale
    tri_count = int(scene.triangle_positions.shape[0])
    exactness_failed = bool(uncertain or overflow)
    stage = f" stop_after={args.stop_after}" if args.stop_after else ""
    contention = (f", CONTENDED host (loadavg {loadavg}, "
                  f"{len(reps)} reps all >1.2x latency)") if contended else ""
    record = {
        "metric": f"ms/frame pipelined{stage} {args.width}x{args.height} "
                  f"{args.spp}spp shadows={not args.no_shadows} "
                  f"{args.scene} ({tri_count} tris, "
                  f"sync latency {round(latency_ms, 1)} ms, "
                  f"uncertain={uncertain}, overflow={overflow}; "
                  f"scaled to 1080p: {round(ms_1080p, 1)} ms"
                  f"{contention})",
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(ms_1080p / 20.0, 4),
        "loadavg": loadavg,
        "pipelined_reps_ms": [round(r, 1) for r in reps],
        "sync_latency_ms": round(latency_ms, 1),
    }
    if contended:
        record["host_contended"] = True
    if exactness_failed:
        record["exactness_failed"] = True
    print(json.dumps(record))
    if exactness_failed:
        # Hard exactness gate (VERDICT r3 #4): the re-trace must drive both
        # counters to zero; a nonzero residual means the measured image may
        # be missing hits/shadows. Fail the process — a green-looking bench
        # with bad counters must not exist.
        import sys
        print(f"EXACTNESS FAILURE: uncertain={uncertain} "
              f"overflow={overflow} after retrace_factor="
              f"{args.retrace_factor} retrace_frac={args.retrace_frac} — "
              f"raise budgets/factor or lower the frac",
              file=sys.stderr)
        sys.exit(2)


if __name__ == "__main__":
    main()
