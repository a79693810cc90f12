"""
Fused multi-analysis streaming
==============================

:func:`run_together` streams a trajectory ONCE and folds every chunk
into several analyses' accumulators inside a SINGLE jitted update —
the TPU-native answer to the reference's one-pass-per-analysis
workflow (each reference class re-reads the trajectory,
``/root/reference/src/mdhelper/analysis/base.py:115-210``; so does
each of ours when run separately).  Host reading, host->HBM transfer
and the streaming scaffolding are paid once instead of once per
analysis — at 100k atoms the transfer is a large fraction of the
per-frame budget for the cheaper analyses, so fusing approaches the
sum of the kernels instead of the sum of the pipelines.

One XLA program per chunk also matters on runtimes that cannot hold
several large executables per process (this environment's TPU tunnel
among them): the fused update contains every analysis's kernel in one
executable.

Analyses participate through the ``_update`` / ``_store_chunk``
chunk protocol (see
:meth:`mdhelper_tpu.analysis.base.SerialAnalysisBase._batched_update`):
the jitted ``_update`` is the pure device half folded into the fused
program, and ``_store_chunk`` absorbs any per-chunk extras (entity
stores, per-frame results) host-side — so EVERY carry-protocol
analysis is fusable, including the store-type ones (Onsager,
DensityProfile, DipoleMoment, the polymer suite).
"""

from typing import Sequence

import jax
import jax.numpy as jnp

from .base import SerialAnalysisBase

__all__ = ["run_together"]


def run_together(
    analyses: Sequence[SerialAnalysisBase],
    start: int = None,
    stop: int = None,
    step: int = None,
    frames=None,
    on_chunk=None,
    parallel: bool = False,
    checkpoint: str = None,
):
    """Run several analyses over one shared trajectory stream.

    Parameters
    ----------
    analyses : sequence of analysis instances
        Carry-protocol analyses sharing the SAME trajectory reader.
        Per-analysis sharding knobs (``parallel=True``, ``shard=``)
        are not supported in fused mode — sharding of the fused
        stream is the `parallel` argument below.
    start, stop, step, frames
        Frame selection, as in ``run()``.
    on_chunk : callable, optional
        Progress hook called with each streamed batch after its
        update has been folded (and synchronized) into the carries.
    parallel : bool, optional
        Shard the fused stream's frame axis over the local device
        mesh (each device folds its sub-batch; XLA inserts the carry
        ``psum`` over ICI).  Requires every device-path analysis to
        be order-independent — sequential physics (trajectory
        unwrap, ISF lag rings) cannot shard frames; host-pipeline
        analyses are unaffected (their absorb consumes the raw host
        chunk).
    checkpoint : str, optional
        ``.npz`` path: persist every analysis's carry + registered
        host stores + the stream position after each chunk, and
        resume an interrupted fused pass from the last completed
        chunk (same contract as ``run(checkpoint=...)``; every
        store-type analysis must be checkpoint-registered, and
        host-pipeline scheduling is rejected — force
        ``MDTPU_HOST_PIPELINE=0`` to checkpoint on a tunnel TPU).

    Returns
    -------
    analyses : the input sequence, with ``results`` populated exactly
        as individual ``run()`` calls would have produced.
    """

    if not analyses:
        raise ValueError("No analyses given.")
    trajectory = analyses[0]._trajectory
    for a in analyses:
        if a._trajectory is not trajectory:
            raise ValueError(
                "All analyses must share the same trajectory reader."
            )
        if getattr(a, "_shard", None) not in (None, False):
            raise ValueError(
                "Sharding knobs are not supported in fused mode."
            )

    # One stream, one coordinate payload: fusing a velocity-payload
    # analysis (VACF) with position analyses would silently feed the
    # wrong arrays to one of them.
    payloads = {getattr(a, "_payload", "positions") for a in analyses}
    if len(payloads) > 1:
        raise ValueError(
            "All fused analyses must stream the same coordinate "
            f"payload; got {sorted(payloads)}. Run the velocity-"
            "payload analyses in their own fused pass."
        )

    # Prepare every analysis exactly as run() would.
    for a in analyses:
        a._setup_frames(
            a._trajectory, start=start, stop=stop, step=step,
            frames=frames,
        )
        a._mesh = None
        a._prepare()
        if getattr(a, "_carry", None) is None:
            raise ValueError(
                f"{type(a).__name__} does not implement the batched "
                "carry protocol; run it separately."
            )

    parts = [a._fused_parts() for a in analyses]
    gathers = []
    for a in analyses:
        if a._host_pipeline:
            # Host-pipeline analyses consume batch.host_positions in
            # their absorb callback; their device half ignores the
            # positions, so no gather belongs in the fused program.
            gathers.append((None, None))
            continue
        idx = a._effective_atom_indices()
        axes = getattr(a, "_coord_axes", None)
        gathers.append((
            None if idx is None else jnp.asarray(idx),
            None if axes is None else jnp.asarray(axes),
        ))

    def fused_update(carries, positions, dimensions, mask):
        out_carries, auxes = [], []
        for i, ((device_fn, _), (idx, axes)) in enumerate(
            zip(parts, gathers)
        ):
            pos = positions if idx is None else positions[:, idx]
            if axes is not None:
                # Analyses that stream a coordinate-axis subset when
                # run standalone get the same columns here.
                pos = pos[:, :, axes]
            carry, aux = device_fn(carries[i], pos, dimensions, mask)
            out_carries.append(carry)
            auxes.append(aux)
        return tuple(out_carries), tuple(auxes)

    fused = jax.jit(fused_update)

    # Drive the stream off a bare base instance so column selection
    # stays the FULL universe (each analysis gathers its own columns
    # on device) and the chunk size accounts for the full width.
    if parallel:
        from .base import ParallelAnalysisBase

        for a in analyses:
            if a._sequential and not a._host_pipeline:
                raise ValueError(
                    f"{type(a).__name__} streams order-dependent "
                    "physics (a lax.scan carry) and cannot shard "
                    "frames; run the fused pass serially or move "
                    "this analysis out of it."
                )
        driver = ParallelAnalysisBase(trajectory)
        driver._sequential = False
    else:
        driver = SerialAnalysisBase(trajectory)
        driver._sequential = True  # single device; order preserved
    driver._setup_frames(
        trajectory, start=start, stop=stop, step=step, frames=frames
    )
    driver._mesh = None
    driver._payload = payloads.pop()
    driver._chunk_bytes = min(a._chunk_bytes for a in analyses)

    carries = tuple(a._carry for a in analyses)
    skip_frames = 0
    for a in analyses:
        # a previous checkpointed pass must not leave the store queue
        # pinned synchronous (mirrors SerialAnalysisBase.run)
        a._checkpoint_sync = False
    if checkpoint is not None:
        import os

        from ..core.checkpoint import load_carry, save_carry

        for i, a in enumerate(analyses):
            if a._host_pipeline:
                raise ValueError(
                    f"{type(a).__name__} resolved to the host-side "
                    "pipeline, whose per-chunk state is not "
                    "captured; set MDTPU_HOST_PIPELINE=0 to "
                    "checkpoint the fused pass."
                )
            if (
                a._store_chunk is not None
                and not a._checkpointable_stores
            ):
                raise ValueError(
                    f"{type(a).__name__}'s host buffers are not "
                    "registered for checkpointing."
                )
            a._checkpoint_sync = True
        if os.path.exists(checkpoint):
            carries, skip_frames, stores = load_carry(
                checkpoint, carries, with_stores=True
            )
            for i, a in enumerate(analyses):
                prefix = f"{i}::"
                sub = {
                    key[len(prefix):]: value
                    for key, value in stores.items()
                    if key.startswith(prefix)
                }
                if sub:
                    a._restore_store_state(sub)

    processed = 0
    for batch in driver._stream_batches():
        n_real = batch.n_real
        if processed + n_real <= skip_frames:
            processed += n_real
            continue
        if processed < skip_frames:
            # straddling resume chunk: mask out the frames the
            # interrupted run already folded (same contract as
            # SerialAnalysisBase.run)
            from .base import _Batch

            done = skip_frames - processed
            mask = jnp.asarray(batch.mask)
            mask = mask.at[:done].set(jnp.zeros((), mask.dtype))
            batch = _Batch(
                batch.positions, batch.dimensions, mask,
                batch.indices, n_real=batch.n_real,
                host_positions=batch.host_positions,
                host_dimensions=batch.host_dimensions,
            )
            for a in analyses:
                if a._store_chunk is not None:
                    a._store_row_skip = done
        carries, auxes = fused(
            carries, batch.positions, batch.dimensions, batch.mask
        )
        carries = driver._sync_carry(carries)
        for (_, absorb), aux in zip(parts, auxes):
            if absorb is not None and aux is not None:
                absorb(aux, batch)
        processed += n_real
        if on_chunk is not None:
            on_chunk(batch)
        if checkpoint is not None:
            merged = {}
            for i, a in enumerate(analyses):
                if a._store_chunk is not None:
                    for key, value in a._store_state().items():
                        merged[f"{i}::{key}"] = value
            save_carry(
                checkpoint, carries, processed,
                stores=merged or None,
            )

    for a, carry in zip(analyses, carries):
        a._carry = carry
        a._drain_stores()
        a._conclude()
    return analyses
