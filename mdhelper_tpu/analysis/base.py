"""
Analysis base classes
=====================

The analysis runtime (reference:
``/root/reference/src/mdhelper/analysis/base.py``).  The public class
names and the ``run(start, stop, step, frames, ...)`` / ``results`` /
``save()`` contract match the reference, but the execution model is
TPU-native:

* Frames are a **batch axis, not a loop**.  Analyses that implement the
  batched protocol (:meth:`_batched_update`) stream fixed-shape
  coordinate chunks from the host reader into HBM and fold them into a
  pytree accumulator ("carry") with a jitted update — one XLA program,
  executed per chunk.
* ``SerialAnalysisBase`` runs the stream on a single device.
  ``ParallelAnalysisBase`` — the reference's multiprocessing / joblib /
  dask frame-parallel scheduler (``base.py:312-507``) — instead shards
  the chunk's frame axis across a :class:`jax.sharding.Mesh` of local
  devices; XLA compiles the cross-device reductions onto ICI.  The
  ``module=``/``method=``/``block=`` knobs of the reference are
  accepted for API compatibility and ignored (there are no worker
  processes to configure).
* ``NumbaAnalysisBase`` (``base.py:212-279``) exists for parity; its
  ``n_threads`` knob is a no-op because XLA owns the thread pool.

Analyses that do not implement the batched protocol fall back to a
classic per-frame host loop via :meth:`_single_frame`, preserving the
MDAnalysis-style extension contract for user subclasses.
"""

import logging
from datetime import datetime
from typing import Iterator, Optional, TextIO, Union

import jax
import jax.numpy as jnp
import numpy as np

from jax.sharding import NamedSharding, PartitionSpec

from ..parallel.mesh import (
    frame_sharding,
    get_mesh,
    pad_to_multiple,
    replicated_sharding,
)

__all__ = [
    "jit_update",
    "Hash",
    "SerialAnalysisBase",
    "NumbaAnalysisBase",
    "JittedAnalysisBase",
    "ParallelAnalysisBase",
    "DynamicAnalysisBase",
]


def host_unwrap_chunk(positions, box, prev, images):
    """Numpy image-flag unwrap of one sequential chunk — the host-
    pipeline mirror of :func:`mdhelper_tpu.ops.pbc.unwrap_scan`
    (vectorized: crossings accumulate as a cumulative sum over the
    frame axis instead of a per-frame scan).

    Parameters: ``positions`` ``(B, ..., 3)`` wrapped frames, ``box``
    ``(3,)``, ``prev`` the wrapped frame preceding the chunk, and
    ``images`` its accumulated image counts (float64 — small integers
    are exact, and one dtype avoids int round trips).

    Returns ``(unwrapped, (new_prev, new_images))``.
    """

    deltas = np.empty_like(positions)
    np.subtract(positions[0], prev, out=deltas[0])
    np.subtract(positions[1:], positions[:-1], out=deltas[1:])
    crossings = np.sign(deltas)
    crossings *= np.abs(deltas) >= box / 2
    np.cumsum(crossings, axis=0, out=crossings)
    new_images = crossings
    np.subtract(images, crossings, out=new_images)
    unwrapped = new_images * box
    unwrapped += positions
    return unwrapped, (positions[-1].copy(), new_images[-1].copy())


def existence_lifetimes(h: np.ndarray) -> tuple:
    """Intermittent correlation c(t) and continuous survival S(t)
    from a boolean existence series ``h`` of shape ``(T, P)`` (P
    independent bond/membership channels), both normalized to 1 at
    t = 0.

    c(t) = <h(0)h(t)> / <h> (Luzar & Chandler 1996) — with 0/1 data
    and the WK engine's triangular normalization, <h(0)h(0)> = <h>,
    so c is the channel-summed ACF over its t = 0 value.

    S(t) counts only channels set at EVERY sample in [0, t]: a
    maximal run of L consecutive ones contributes ``max(L - t, 0)``
    origins at lag t, so with cnt[L] runs of each length,
    ``num(t) = sum_{L > t} cnt[L] (L - t)`` — two reversed cumulative
    sums, O(T) after the run-length scan.
    """

    from ..algorithm.correlation import correlation_fft

    T, P = h.shape
    ever = h.any(axis=0)
    if not ever.any():
        empty = np.zeros(T)
        if T:
            empty[0] = 1.0
        return empty, empty.copy()
    h = h[:, ever]
    acf = np.asarray(
        correlation_fft(h.astype(np.float64), axis=0)
    ).sum(axis=1)
    c = acf / acf[0]

    P = h.shape[1]
    # column-major flatten with a zero separator so every run closes
    # inside its own channel's series
    flat = np.concatenate(
        [h.T, np.zeros((P, 1), dtype=bool)], axis=1
    ).ravel()
    d = np.diff(np.concatenate([[0], flat.astype(np.int8)]))
    lengths = np.flatnonzero(d == -1) - np.flatnonzero(d == 1)
    cnt = np.bincount(lengths, minlength=T + 2).astype(np.float64)
    rev1 = np.append(np.cumsum(cnt[::-1])[::-1], 0.0)
    rev2 = np.append(
        np.cumsum((cnt * np.arange(len(cnt)))[::-1])[::-1], 0.0
    )
    t = np.arange(T)
    num = rev2[t + 1] - t * rev1[t + 1]
    S = num / (T - t)
    return c, S / S[0]


def jit_update(fn):
    """jit an accumulator-update function, donating the carry where the
    backend supports it.  Donation halves accumulator HBM traffic but
    crashes this environment's TPU runtime (a known axon bug), so on
    TPU the carry is copied instead."""

    import jax as _jax

    if _jax.default_backend() == "tpu":
        return _jax.jit(fn)
    return _jax.jit(fn, donate_argnums=0)




class Hash(dict):
    """A `dict` with attribute access; the results container.
    Parity: ``analysis/base.py:79-113``."""

    def __init__(self, *args, **kwargs):
        super().__init__()
        for arg in args:
            if not isinstance(arg, dict):
                raise TypeError(
                    "Positional arguments must be dictionaries."
                )
            for key, value in arg.items():
                self[key] = value
        for key, value in kwargs.items():
            self[key] = value

    def __getattr__(self, name):
        return self.get(name)

    def __setattr__(self, name, value):
        self[name] = value

    def __delattr__(self, name):
        del self[name]


class _Batch:
    """One device-ready chunk of trajectory data."""

    __slots__ = (
        "positions", "dimensions", "mask", "indices", "n_real",
        "host_positions", "host_dimensions",
    )

    def __init__(self, positions, dimensions, mask, indices,
                 n_real=None, host_positions=None, host_dimensions=None):
        self.positions = positions
        self.dimensions = dimensions
        self.mask = mask
        self.indices = indices
        #: host-side count of real (unmasked) frames — the device mask
        #: may span non-addressable devices in a multi-host job.
        self.n_real = len(indices) if n_real is None else n_real
        #: aliases of the reader's raw chunk (full atom width, reader
        #: dtype, no frame padding) for host-pipeline analyses — free
        #: to keep, since the arrays are alive for the iteration
        #: anyway.  ``None`` in multi-host jobs.
        self.host_positions = host_positions
        self.host_dimensions = host_dimensions


class SerialAnalysisBase:
    """Single-device streaming analysis driver.

    Parity: ``analysis/base.py:115-210``.  Subclasses implement either

    * the **batched protocol**: :meth:`_prepare` allocates the carry,
      :meth:`_batched_update` folds one ``(B, N, 3)`` chunk into it,
      :meth:`_conclude` normalizes into ``results``; or
    * the **frame protocol**: :meth:`_single_frame`, executed in a host
      loop with ``self._ts`` set to the current frame.
    """

    #: set True by analyses whose update is order-dependent (e.g. a
    #: trajectory unwrap scan); forces single-device execution even
    #: under ParallelAnalysisBase.
    _sequential: bool = False

    def __init__(self, trajectory, verbose: bool = False, **kwargs):
        self._trajectory = trajectory
        self._verbose = verbose
        self._pending_stores = []
        self.results = Hash()

    # -- frame bookkeeping -------------------------------------------------
    def _setup_frames(
        self,
        trajectory=None,
        start: int = None,
        stop: int = None,
        step: int = None,
        frames=None,
    ) -> None:
        trajectory = trajectory or self._trajectory
        if frames is not None:
            if start is not None or stop is not None or step is not None:
                raise ValueError(
                    "start/stop/step cannot be combined with frames."
                )
            self.frames = np.arange(trajectory.n_frames)[frames]
            self.start = self.stop = self.step = None
        else:
            start, stop, step = trajectory.check_slice_indices(
                start, stop, step
            )
            self.start, self.stop, self.step = start, stop, step
            self.frames = np.arange(start, stop, step)
        self.n_frames = len(self.frames)
        self.times = np.asarray(
            [trajectory._read_time(int(i)) for i in self.frames]
        )

    # -- extension points --------------------------------------------------
    def _prepare(self) -> None:
        pass

    def _single_frame(self) -> None:
        raise NotImplementedError

    def _batched_update(self, carry, batch: _Batch):
        """Fold one streamed chunk into the carry.  The default drives
        the ``_update`` / ``_store_chunk`` pair (see those hooks);
        subclasses without a jitted ``_update`` override this (or
        implement the frame protocol instead).

        Store-type extras are absorbed ONE CHUNK LATE: the device
        arrays start their device-to-host copy immediately
        (``copy_to_host_async``) but ``_store_chunk`` runs when the
        NEXT chunk's update has been dispatched, so the (possibly
        large) extras transfer overlaps compute instead of
        serializing the stream.  :meth:`_drain_stores` flushes the
        tail before :meth:`_conclude`.
        """

        if self._host_pipeline:
            self._host_update_async(batch)
            return carry
        update = getattr(self, "_update", None)
        if update is None:
            return NotImplemented
        out = update(
            carry, batch.positions, batch.dimensions, batch.mask
        )
        if self._store_chunk is None:
            return out
        carry, extras = out
        self._queue_store(extras, batch)
        return carry

    def _queue_store(self, extras, batch: _Batch) -> None:
        """Start the async fetch of one chunk's extras, absorbing any
        previously queued chunk (whose copy has had a full chunk of
        compute to finish).

        Default resolves per runtime: asynchronous everywhere except
        the axon TPU tunnel, where a same-window interleaved A/B
        measured outstanding async copies interfering with the next
        dispatch (sync 4.11/3.50 fps vs async 4.05/2.49 on the
        Onsager store phase) — consistent with its device-chained
        execution pathology.  ``MDTPU_SYNC_STORE=1``/``0`` forces
        either mode."""

        import os

        if jax.process_count() > 1:
            # Multi-host: frame-sharded extras span other hosts'
            # devices, so the per-class np.asarray fetches in
            # _store_chunk would fail; re-assemble the global arrays
            # on every host up front (tiled allgather over DCN).
            from ..parallel.mesh import fetch_global

            extras = jax.tree_util.tree_map(
                lambda leaf: fetch_global(leaf)
                if isinstance(leaf, jax.Array)
                else leaf,
                extras,
            )
        knob = os.environ.get("MDTPU_SYNC_STORE")
        sync = (
            knob not in (None, "", "0")
            if knob is not None
            else "axon" in os.environ.get("JAX_PLATFORMS", "")
        )
        if getattr(self, "_checkpoint_sync", False):
            sync = True  # checkpointed stores must not lag the carry
        skip = getattr(self, "_store_row_skip", 0)
        if skip:
            # Checkpoint-resume straddling chunk: drop the rows the
            # interrupted run already stored (their recomputed values
            # may be wrong for sequential analyses, whose masked
            # frames see a frozen scan state).
            self._store_row_skip = 0
            extras = jax.tree_util.tree_map(
                lambda leaf: leaf[skip:]
                if getattr(leaf, "ndim", 0)
                else leaf,
                extras,
            )
            batch = _Batch(
                batch.positions, batch.dimensions, batch.mask,
                batch.indices[skip:],
                n_real=batch.n_real - skip,
                host_positions=batch.host_positions,
                host_dimensions=batch.host_dimensions,
            )
        if sync:
            self._store_chunk(extras, batch)
            return
        jax.tree_util.tree_map(
            lambda leaf: leaf.copy_to_host_async()
            if isinstance(leaf, jax.Array)
            else None,
            extras,
        )
        self._drain_stores()
        self._pending_stores.append((extras, batch))

    def _drain_stores(self) -> None:
        for extras, batch in self._pending_stores:
            self._store_chunk(extras, batch)
        self._pending_stores.clear()
        future = getattr(self, "_host_future", None)
        if future is not None:
            self._host_future = None
            future.result()

    def _setup_periodic_box(self) -> None:
        """Set ``self._triclinic`` from the universe's box angles
        (one shared detection; previously copy-pasted per module).
        Zero-length boxes (box-less XYZ files) are aperiodic, not
        triclinic — the orthorhombic min-image helpers treat their
        zero lengths as infinite periods."""

        dims = self.universe.dimensions
        self._triclinic = bool(
            dims is not None
            and len(dims) >= 6
            and (np.asarray(dims[:3]) > 0).all()
            and not np.allclose(dims[3:6], 90.0)
        )

    def _require_box(self, what: str) -> None:
        """Raise cleanly for box-less universes (zero-dimension XYZ
        files): analyses whose math needs a periodic cell (volume
        norms, wavevector grids) would otherwise produce NaNs."""

        dims = self.universe.dimensions
        if dims is None or not (np.asarray(dims[:3]) > 0).all():
            raise ValueError(
                f"{what} needs a periodic box with non-zero "
                "dimensions (this universe has none)."
            )

    def _frame_boxes(self, dimensions):
        """Per-frame box representation for update kernels:
        ``(B, 3)`` orthorhombic lengths or ``(B, 3, 3)``
        lower-triangular matrices for triclinic cells (both accepted
        by the min-image helpers in
        :mod:`mdhelper_tpu.ops.histogram`).  ``self._triclinic`` is
        static at trace time, so capturing this bound method in a
        jitted update is safe."""

        from ..algorithm.topology import triclinic_matrices

        if self._triclinic:
            return triclinic_matrices(dimensions)
        return dimensions[:, :3]

    def _uniform_lag_dt(self, what: str) -> float:
        """Lag-grid spacing (ps) for WK-correlator conclusions:
        trajectory ``dt`` times the (required-uniform) frame stride.
        Raises for non-uniform frame selections — the FFT correlator
        silently assumes an even grid."""

        steps = np.diff(self.frames)
        if len(steps) and not np.all(steps == steps[0]):
            raise ValueError(
                f"{what} needs uniformly spaced frames (the "
                "Wiener-Khinchin correlator assumes a constant lag "
                "grid); got a non-uniform frame selection."
            )
        stride = int(steps[0]) if len(steps) else 1
        return self._trajectory.dt * stride

    # -- store-type checkpointing -------------------------------------------
    #: Store-type analyses whose host buffers are fully captured by
    #: :meth:`_store_state` (every per-frame buffer is either a
    #: frame-leading numeric array in ``results`` or named by
    #: :meth:`_checkpoint_attrs`) opt in by setting this True.  The
    #: default False makes ``run(checkpoint=...)`` refuse rather than
    #: silently checkpoint half the state.
    _checkpointable_stores: bool = False

    def _checkpoint_attrs(self) -> tuple:
        """Names of private host buffers filled by ``_store_chunk``
        (beyond the ``results`` arrays), persisted by store-type
        checkpointing.  Subclasses with such buffers override."""

        return ()

    def _store_state(self) -> dict:
        """Host store state for :func:`~mdhelper_tpu.core.checkpoint.
        save_carry`: the store offset, every numeric array in
        ``results`` (per-frame buffers restore their filled prefix;
        static arrays round-trip unchanged), and the buffers named by
        :meth:`_checkpoint_attrs`."""

        state = {
            "__store_offset__": np.int64(
                getattr(self, "_store_offset", 0)
            ),
        }
        for key, value in self.results.items():
            if (
                isinstance(value, np.ndarray)
                and value.dtype != object
            ):
                state[f"results::{key}"] = value
        offset = int(getattr(self, "_store_offset", 0))
        for attr in self._checkpoint_attrs():
            value = getattr(self, attr, None)
            if value is not None:
                # The private store buffers are frame-leading by
                # construction: persist only the filled prefix so a
                # per-chunk checkpoint costs O(frames done), not
                # O(n_frames) (restore prefix-copies anyway).
                state[f"attr::{attr}"] = np.asarray(value)[:offset]
        return state

    def _restore_store_state(self, stores: dict) -> None:
        """Restore :meth:`_store_state` into this run's (freshly
        prepared) buffers.  Arrays restore into the leading prefix so
        a partial run's checkpoint resumes into a longer frame
        selection (the same-origin contract the carry path has)."""

        offset = stores.pop("__store_offset__", None)
        if offset is not None:
            self._store_offset = int(offset)

        def restore(dst, src, name):
            if (
                not isinstance(dst, np.ndarray)
                or dst.shape[1:] != src.shape[1:]
                or dst.shape[0] < src.shape[0]
            ):
                raise ValueError(
                    f"Checkpointed store {name!r} (shape {src.shape}) "
                    "is incompatible with this run's frame selection "
                    f"(buffer shape {getattr(dst, 'shape', None)}); "
                    "resume with the same analysis configuration and "
                    "a frame selection extending the original."
                )
            dst[: len(src)] = src

        for key, value in stores.items():
            kind, _, name = key.partition("::")
            if kind == "results":
                restore(self.results.get(name), value, name)
            else:
                restore(getattr(self, name, None), value, name)

    def _conclude(self) -> None:
        pass

    # -- host pipeline -----------------------------------------------------
    #: when True, the per-chunk update runs on the HOST (numpy) via
    #: :meth:`_host_update` instead of the jitted device ``_update``.
    #: Analyses whose conclusion is host-side anyway (e.g. the Onsager
    #: MSD, whose f64 FFT cannot lower on TPU) and whose per-frame work
    #: is O(N) bookkeeping opt in: on a *tunnel-attached* TPU the
    #: device round trip (upload + store fetch + carry sync) costs far
    #: more than the math, so the heterogeneous schedule places the
    #: stage host-side and the device program never sees it.  Resolved
    #: in ``_prepare`` via :meth:`_resolve_host_pipeline`; on
    #: direct-attached runtimes the device path remains the default.
    _host_pipeline: bool = False

    @staticmethod
    def _resolve_host_pipeline() -> bool:
        """True iff the backend is a tunnel-attached TPU (the axon
        runtime), where per-chunk device round trips dominate O(N)
        per-frame math.  ``MDTPU_HOST_PIPELINE=1``/``0`` forces."""

        import os

        knob = os.environ.get("MDTPU_HOST_PIPELINE")
        if knob not in (None, ""):
            return knob != "0"
        return (
            jax.default_backend() == "tpu"
            and "axon" in os.environ.get("JAX_PLATFORMS", "")
        )

    def _host_update(self, batch: "_Batch") -> None:
        """Absorb one raw host chunk (``batch.host_positions``, full
        atom width, reader dtype, unpadded frames).  Host-pipeline
        analyses assign ``self._host_update_fn`` in ``_prepare``."""

        fn = getattr(self, "_host_update_fn", None)
        if fn is None:
            raise NotImplementedError
        fn(batch)

    def _host_chunk_positions(self, batch: "_Batch") -> np.ndarray:
        """Float64 positions of one raw host chunk with this analysis's
        atom-column selection applied (mirrors what the device stream
        would have received, in the host pipeline's precision)."""

        positions = batch.host_positions[: batch.n_real]
        cols = self._effective_atom_indices()
        if cols is not None:
            positions = positions[:, cols]
        return np.asarray(positions, dtype=np.float64)

    def _host_update_async(self, batch: "_Batch") -> None:
        """Run :meth:`_host_update` one chunk deep on a single worker
        thread.  Device execution waits are network/DMA-bound (the GIL
        is released), so the host numpy genuinely overlaps them even
        on a single core; one worker keeps order-dependent updates
        (unwrap carries) sequential.  The reader hands out fresh
        arrays per chunk, so a deferred update never sees clobbered
        data.  :meth:`_drain_stores` joins the tail."""

        future = getattr(self, "_host_future", None)
        if future is not None:
            self._host_future = None
            future.result()
        executor = getattr(self, "_host_executor", None)
        if executor is None:
            from concurrent.futures import ThreadPoolExecutor

            executor = self._host_executor = ThreadPoolExecutor(
                max_workers=1
            )
        self._host_future = executor.submit(self._host_update, batch)

    # -- batching ------------------------------------------------------------
    #: overlap the NEXT chunk's host work (file read/decode, dtype
    #: cast, padding, device upload) with the current chunk's compute:
    #: a depth-1 pipeline on one worker thread.  ``None`` resolves in
    #: :meth:`_prefetch_enabled`; ``MDTPU_PREFETCH=1``/``0`` forces.
    _prefetch_batches = None

    def _prefetch_enabled(self) -> bool:
        import os

        knob = os.environ.get("MDTPU_PREFETCH")
        if knob not in (None, ""):
            return knob != "0"
        if self._prefetch_batches is not None:
            return bool(self._prefetch_batches)
        # Multi-host chunks assemble globally sharded arrays
        # (cross-process coordination); keep that on the main thread.
        return jax.process_count() == 1

    def _stream_batches(self) -> Iterator["_Batch"]:
        """:meth:`_iter_batches`, optionally pipelined one chunk deep:
        while the consumer folds chunk *n*, a worker thread reads,
        casts and ``device_put``\\ s chunk *n + 1* (trajectory codecs
        and transfers release the GIL).  The reader hands out fresh
        arrays per chunk, so an in-flight prefetch never sees
        clobbered data."""

        gen = self._iter_batches()
        if not self._prefetch_enabled():
            yield from gen
            return
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=1) as executor:
            future = executor.submit(next, gen, None)
            while True:
                batch = future.result()
                if batch is None:
                    return
                future = executor.submit(next, gen, None)
                yield batch

    #: atom indices to read per frame (None = all atoms); subclasses may
    #: set this in __init__/_prepare to slice reader columns on the host.
    _atom_indices: Optional[np.ndarray] = None
    #: what the stream's coordinate payload is: "positions" (default),
    #: "velocities" (for VACF-style analyses; the reader must
    #: support ``read_velocity_frames``), or "positions+velocities"
    #: (both, concatenated on the last axis into ``(B, N, 6)`` chunks
    #: — flow/temperature profiles bin positions with velocity
    #: weights).  The payload rides the same chunking/padding/
    #: sharding/prefetch machinery either way; ``_coord_axes`` indexes
    #: the concatenated width (0-2 positions, 3-5 velocities).
    _payload: str = "positions"
    #: coordinate axes to stream (None = all three); analyses that only
    #: consume a subset (e.g. a z-axis density profile) set this in
    #: _prepare to cut the host->HBM transfer proportionally.
    _coord_axes = None
    #: optional host-side chunk transform ``f(positions, block) ->
    #: positions`` applied to the raw ``(B, N, width)`` payload right
    #: after reading (before atom/axis slicing and upload); ``block``
    #: holds the chunk's global frame indices.  Used for precomputed
    #: per-frame corrections (e.g. DensityProfile's parallel
    #: recentering shifts) that keep the device update
    #: order-independent.  Device-stream paths only (host-pipeline
    #: analyses consume raw chunks).
    _host_transform = None
    #: HBM budget per coordinate chunk.  With the depth-1 prefetch
    #: two chunks are resident at once (n computing, n+1 uploaded),
    #: so this is half the effective coordinate budget.
    _chunk_bytes: int = 128 << 20
    #: dtype coordinates are cast to before device_put.  ``None``
    #: (default) resolves by backend: float32 on TPU — f64 there is
    #: emulated (~100x slow) and the exact kernels deliver f64-grade
    #: results from f32 inputs via double-float arithmetic
    #: (`ops/doublefloat.py`) — float64 elsewhere.
    _coord_dtype = None

    def _stream_dtype(self) -> np.dtype:
        if self._coord_dtype is not None:
            return np.dtype(self._coord_dtype)
        return np.dtype(
            np.float32
            if jax.default_backend() == "tpu"
            else np.float64
        )

    def _payload_width(self) -> int:
        """Width of the streamed last axis before ``_coord_axes``
        slicing: 3 for a single payload, 6 for the concatenated
        positions+velocities stream."""

        return 6 if self._payload == "positions+velocities" else 3

    def _read_payload(self, block) -> tuple:
        """Read one frame block's payload + box dimensions from the
        trajectory reader according to ``_payload``."""

        if self._payload == "velocities":
            # box-only + velocity reads: decoding the (discarded)
            # positions would double the reader work
            return (
                self._trajectory.read_velocity_frames(block),
                self._trajectory.read_dimension_frames(block),
            )
        if self._payload == "positions+velocities":
            # the combined reader entry decodes each frame once
            # (read_frames + read_velocity_frames would decode TRR
            # frames twice)
            positions, velocities, dimensions = (
                self._trajectory.read_frames_with_velocities(block)
            )
            return (
                np.concatenate([positions, velocities], axis=-1),
                dimensions,
            )
        return self._trajectory.read_frames(block)

    def _effective_atom_indices(self) -> Optional[np.ndarray]:
        """``_atom_indices``, with the identity selection (every atom,
        in order) normalized to ``None`` — an identity fancy-index
        would copy the whole chunk on the host every iteration."""

        idx = self._atom_indices
        if idx is None:
            return None
        n = self._trajectory.n_atoms
        if len(idx) == n and np.array_equal(idx, np.arange(n)):
            return None
        return idx

    #: which axis of the streamed ``(B, N, 3)`` chunks is sharded over
    #: the mesh: ``"frames"`` (data parallelism, the default),
    #: ``"atoms"`` (context-parallel ring pass; frames stay whole), or
    #: ``"replicated"`` (chunks replicated — used when the analysis
    #: shards a non-trajectory axis such as the wavevectors instead).
    _shard_axis: str = "frames"

    def _n_shards(self) -> int:
        return 1

    def _stream_mesh(self):
        """The mesh streamed batches are placed on.  Analyses that
        shard a non-frame axis build ``self._mesh`` in ``_prepare``;
        otherwise a 1-D frame mesh is created lazily."""

        mesh = getattr(self, "_mesh", None)
        if mesh is None:
            n_shards = 1 if self._sequential else self._n_shards()
            mesh = get_mesh(n_shards)
            self._mesh = mesh
        return mesh

    def _iter_batches(self) -> Iterator[_Batch]:
        """Stream device-ready chunks of the selected frames."""

        mesh = self._stream_mesh()
        n_shards = mesh.devices.size
        axis = mesh.axis_names[0]
        replicated = replicated_sharding(mesh)
        shard_axis = self._shard_axis
        if shard_axis == "frames":
            data_sharding = frame_sharding(mesh)
            box_sharding = frame_sharding(mesh, batch_ndim=2)
            mask_sharding = frame_sharding(mesh, batch_ndim=1)
        elif shard_axis == "atoms":
            data_sharding = NamedSharding(
                mesh, PartitionSpec(None, axis, None)
            )
            box_sharding = mask_sharding = replicated
        else:
            data_sharding = box_sharding = mask_sharding = replicated

        atom_indices = self._effective_atom_indices()
        n_atoms = (
            len(atom_indices)
            if atom_indices is not None
            else self._trajectory.n_atoms
        )
        itemsize = self._stream_dtype().itemsize
        per_frame = max(n_atoms * self._payload_width() * itemsize, 1)
        chunk = int(max(1, self._chunk_bytes // per_frame))
        frame_multiple = n_shards if shard_axis == "frames" else 1
        chunk = max(frame_multiple, chunk - chunk % frame_multiple)

        multihost = jax.process_count() > 1
        if multihost and self._sequential:
            raise NotImplementedError(
                "Order-dependent analyses (ISF ring buffers, unwrap "
                "scans) stream on a single host."
            )

        for lo in range(0, self.n_frames, chunk):
            block = self.frames[lo:lo + chunk]
            if multihost and shard_axis == "frames":
                yield self._multihost_batch(
                    block, n_shards, data_sharding, box_sharding,
                    mask_sharding,
                )
                continue
            if multihost:
                # Non-frame shardings (q tensor sharding's replicated
                # chunks, the atoms ppermute ring): every host reads
                # the FULL chunk — the trajectory source must be
                # host-identical — and each addressable shard is cut
                # from it by global index, so any sharding layout
                # works without per-process offset bookkeeping.
                yield self._multihost_replicated_batch(
                    block, n_shards, shard_axis, data_sharding,
                    box_sharding, mask_sharding,
                )
                continue
            positions, dimensions = self._read_payload(block)
            if self._host_transform is not None:
                positions = self._host_transform(positions, block)
            host_positions, host_dimensions = positions, dimensions
            if self._host_pipeline:
                # Host-pipeline analyses consume the raw chunk as-is;
                # no device transfer, slicing or padding is needed.
                yield _Batch(
                    None, None, None, block,
                    host_positions=host_positions,
                    host_dimensions=host_dimensions,
                )
                continue
            if atom_indices is not None:
                positions = positions[:, atom_indices]
            if self._coord_axes is not None:
                positions = positions[:, :, self._coord_axes]
            positions = positions.astype(self._stream_dtype(), copy=False)
            if shard_axis == "frames":
                positions, mask = pad_to_multiple(positions, n_shards)
                dimensions, _ = pad_to_multiple(dimensions, n_shards)
            else:
                mask = np.ones(len(block), dtype=np.float64)
                if shard_axis == "atoms":
                    # Pad the atom axis to a shard multiple; kernels
                    # mask padded rows by their (static) global index.
                    positions, _ = pad_to_multiple(
                        positions, n_shards, axis=1
                    )
            yield _Batch(
                jax.device_put(positions, data_sharding),
                jax.device_put(dimensions, box_sharding),
                jax.device_put(mask, mask_sharding),
                block,
                host_positions=host_positions,
                host_dimensions=host_dimensions,
            )

    def _multihost_batch(
        self, block, n_shards, data_sharding, box_sharding,
        mask_sharding,
    ) -> _Batch:
        """Assemble one globally sharded chunk in a multi-host job:
        this host reads ONLY the frames its devices own (the per-host
        reader-offset contract, :func:`mdhelper_tpu.parallel.mesh.
        process_frame_block`) and contributes them as process-local
        shards of the global array."""

        from ..parallel.mesh import process_frame_block

        atom_indices = self._effective_atom_indices()
        padded = len(block) + (-len(block)) % n_shards
        mask_global = np.zeros(padded, dtype=np.float64)
        mask_global[: len(block)] = 1.0
        lo, hi = process_frame_block(padded)
        local_idx = block[lo:min(hi, len(block))]

        n_atoms = (
            len(atom_indices)
            if atom_indices is not None
            else self._trajectory.n_atoms
        )
        per_proc = hi - lo
        if len(local_idx):
            positions, dimensions = self._read_payload(local_idx)
            if self._host_transform is not None:
                positions = self._host_transform(positions, local_idx)
            if atom_indices is not None:
                positions = positions[:, atom_indices]
            if self._coord_axes is not None:
                positions = positions[:, :, self._coord_axes]
            positions = positions.astype(self._stream_dtype(), copy=False)
            pad = per_proc - len(local_idx)
            if pad:
                positions = np.concatenate(
                    (positions, np.repeat(positions[-1:], pad, axis=0))
                )
                dimensions = np.concatenate(
                    (dimensions,
                     np.repeat(dimensions[-1:], pad, axis=0))
                )
        else:
            # This host's whole block is padding (masked out).
            width = (
                self._payload_width()
                if self._coord_axes is None
                else len(self._coord_axes)
            )
            positions = np.zeros(
                (per_proc, n_atoms, width), dtype=self._stream_dtype()
            )
            dimensions = np.ones((per_proc, 6), dtype=np.float64)
        return _Batch(
            jax.make_array_from_process_local_data(
                data_sharding, positions,
                (padded, n_atoms, positions.shape[2]),
            ),
            jax.make_array_from_process_local_data(
                box_sharding, dimensions, (padded, 6)
            ),
            jax.make_array_from_process_local_data(
                mask_sharding, mask_global[lo:hi], (padded,)
            ),
            block,
        )

    def _multihost_replicated_batch(
        self, block, n_shards, shard_axis, data_sharding,
        box_sharding, mask_sharding,
    ) -> _Batch:
        """Assemble one chunk in a multi-host job for the non-frame
        sharding layouts: every host reads the whole chunk (identical
        trajectory source per host) and ``make_array_from_callback``
        slices each addressable device's shard out of it — replicated
        payloads (``shard='q'``) and atom-sharded ring payloads alike.
        """

        positions, dimensions = self._read_payload(block)
        if self._host_transform is not None:
            positions = self._host_transform(positions, block)
        # host_positions carries the RAW pre-slicing payload — the
        # same contract as _stream_batches (store-type consumers
        # index it with full-universe atom indices).
        host_positions = positions
        atom_indices = self._effective_atom_indices()
        if atom_indices is not None:
            positions = positions[:, atom_indices]
        if self._coord_axes is not None:
            positions = positions[:, :, self._coord_axes]
        positions = positions.astype(
            self._stream_dtype(), copy=False
        )
        mask = np.ones(len(block), dtype=np.float64)
        if shard_axis == "atoms":
            from ..parallel.mesh import pad_to_multiple

            positions, _ = pad_to_multiple(
                positions, n_shards, axis=1
            )

        def from_full(full, sharding):
            return jax.make_array_from_callback(
                full.shape, sharding, lambda idx: full[idx]
            )

        return _Batch(
            from_full(positions, data_sharding),
            from_full(np.asarray(dimensions), box_sharding),
            from_full(mask, mask_sharding),
            block,
            host_positions=host_positions,
            host_dimensions=dimensions,
        )

    # -- driver ----------------------------------------------------------
    def run(
        self,
        start: int = None,
        stop: int = None,
        step: int = None,
        frames=None,
        verbose: bool = None,
        checkpoint: str = None,
        **kwargs,
    ) -> "SerialAnalysisBase":
        """Run the analysis over the selected frames.

        With `checkpoint` set (a ``.npz`` path), the accumulator carry
        is persisted after every streamed chunk and an interrupted run
        resumes from the last completed chunk (carry-accumulating
        analyses only).
        """

        verbose = self._verbose if verbose is None else verbose
        if verbose:
            time_start = datetime.now()
            logging.info(f"Starting {type(self).__name__} analysis...")

        self._setup_frames(
            self._trajectory, start=start, stop=stop, step=step,
            frames=frames,
        )
        self._mesh = None
        self._prepare()

        # per-run flag: a previous checkpointed run() on this instance
        # must not leave the store queue pinned synchronous
        self._checkpoint_sync = False
        carry = getattr(self, "_carry", None)
        if carry is not None:
            skip_frames = 0
            if checkpoint is not None:
                import os

                from ..core.checkpoint import load_carry, save_carry

                store_type = self._store_chunk is not None
                # Host pipelines accumulate in private numpy buffers
                # the checkpoint cannot capture — store-type AND
                # carry-only alike (a carry-only host pipeline would
                # otherwise resume from zeroed accumulators and
                # silently drop every pre-checkpoint frame).
                if self._host_pipeline:
                    raise ValueError(
                        "Checkpointing is not supported with the "
                        "host-side pipeline (per-chunk host state "
                        "is not captured); set "
                        "MDTPU_HOST_PIPELINE=0 to checkpoint."
                    )
                if store_type:
                    if not self._checkpointable_stores:
                        raise ValueError(
                            "Checkpointing is not supported for this "
                            "analysis: its per-frame host buffers are "
                            "not registered for checkpointing (see "
                            "SerialAnalysisBase._checkpointable_"
                            "stores)."
                        )
                    # Store extras must be absorbed synchronously so
                    # the host buffers saved after chunk n actually
                    # contain chunk n (the default queue is one chunk
                    # late, which would desynchronize the store from
                    # the saved frame count).
                    self._checkpoint_sync = True
                if os.path.exists(checkpoint):
                    carry, skip_frames, stores = load_carry(
                        checkpoint, carry, with_stores=True
                    )
                    if stores:
                        self._restore_store_state(stores)
                    logging.info(
                        f"Resuming from {checkpoint} at frame "
                        f"{skip_frames}."
                    )
            processed = 0
            for batch in self._stream_batches():
                n_real = batch.n_real
                if processed + n_real <= skip_frames:
                    processed += n_real
                    continue
                if processed < skip_frames:
                    # The resume chunk straddles the checkpoint
                    # boundary (the interrupted run's last chunk was
                    # truncated at a different edge): zero the mask of
                    # the already-processed leading frames so the
                    # carry doesn't double-count them (sequential
                    # scans freeze on masked frames), and have the
                    # store path drop those rows (_store_row_skip).
                    done = skip_frames - processed
                    mask = jnp.asarray(batch.mask)
                    mask = mask.at[:done].set(
                        jnp.zeros((), mask.dtype)
                    )
                    batch = _Batch(
                        batch.positions, batch.dimensions, mask,
                        batch.indices, n_real=batch.n_real,
                        host_positions=batch.host_positions,
                        host_dimensions=batch.host_dimensions,
                    )
                    self._store_row_skip = done
                carry = self._batched_update(carry, batch)
                carry = self._sync_carry(carry)
                processed += n_real
                if checkpoint is not None:
                    save_carry(
                        checkpoint, carry, processed,
                        stores=(
                            self._store_state()
                            if self._store_chunk is not None
                            else None
                        ),
                    )
            self._carry = carry
        else:
            # Classic per-frame host loop for user subclasses.
            for index, frame in enumerate(self.frames):
                self._ts = self._trajectory[int(frame)]
                self._frame_index = index
                self._single_frame()

        self._drain_stores()
        self._conclude()
        if verbose:
            logging.info(
                f"Analysis finished in {datetime.now() - time_start}."
            )
        return self

    #: host-side half of the chunk protocol: analyses whose jitted
    #: ``_update`` returns ``(carry, extras)`` define
    #: ``_store_chunk(extras, batch)`` to absorb the extras into host
    #: buffers (per-frame results, entity stores).  ``None`` means the
    #: update returns the carry alone.
    _store_chunk = None

    def _fused_parts(self):
        """Device/host split for fused multi-analysis streaming
        (:func:`mdhelper_tpu.analysis.multi.run_together`): returns
        ``(device_fn, absorb)`` where ``device_fn(carry, positions,
        dimensions, mask) -> (carry, aux)`` is pure and jit-safe, and
        ``absorb(aux, batch)`` performs any host-side storage.

        Derived automatically from ``_update`` + ``_store_chunk``, so
        every carry-protocol analysis is fusable without overrides.
        """

        if self._host_pipeline:
            # The host half does all the work; the fused device program
            # carries the state through untouched (a token aux keeps
            # the absorb callback firing per chunk).
            def device_fn(carry, positions, dimensions, mask):
                del positions, dimensions, mask
                return carry, jnp.zeros(())

            def absorb(aux, batch):
                del aux
                self._host_update_async(batch)

            return device_fn, absorb

        update = self._update
        if self._store_chunk is not None:
            # Queue-based absorb: same one-chunk-late async fetch as
            # the standalone run() path (drained by _conclude via
            # run_together's _drain_stores call).
            return (
                lambda c, p, d, m: update(c, p, d, m)
            ), self._queue_store

        def device_fn(carry, positions, dimensions, mask):
            return update(carry, positions, dimensions, mask), None

        return device_fn, None

    #: break the device-resident carry chain after every streamed
    #: chunk by round-tripping the carry through host memory.
    #: ``None`` (default) resolves to True on TPU: this environment's
    #: TPU tunnel executes chains of programs whose inputs are other
    #: programs' device outputs pathologically (measured >10x
    #: end-to-end slowdown, with multi-second stalls per execution),
    #: while host-round-tripped carries run at full speed — a tiny
    #: per-chunk transfer for accumulator-sized carries.  Carries
    #: above ``_sync_carry_bytes`` keep their large leaves on device
    #: (only a small leaf is fetched to bound queue depth).  Set
    #: False to restore fully async pipelining (e.g. on a
    #: direct-attached TPU runtime).
    _sync_chunks = None
    _sync_carry_bytes: int = 32 << 20

    def _sync_carry(self, carry):
        sync = self._sync_chunks
        if sync is None:
            sync = jax.default_backend() == "tpu"
        if not sync:
            return carry
        leaves = [
            leaf
            for leaf in jax.tree_util.tree_leaves(carry)
            if isinstance(leaf, jax.Array)
        ]
        if not leaves:
            return carry
        if sum(leaf.nbytes for leaf in leaves) <= self._sync_carry_bytes:

            def fetch(leaf):
                if not isinstance(leaf, jax.Array):
                    return leaf
                if not (
                    leaf.is_fully_addressable
                    or leaf.is_fully_replicated
                ):
                    # Multi-host shard spanning other hosts: a host
                    # round trip would need an allgather; a barrier
                    # sync is all the chain-break requires.
                    jax.block_until_ready(leaf)
                    return leaf
                return np.asarray(leaf)

            return jax.tree_util.tree_map(fetch, carry)
        # Large carry (e.g. an ISF incoherent ring buffer): fetch one
        # small leaf to synchronize without paying the full transfer.
        small = min(leaves, key=lambda leaf: leaf.size)
        if small.is_fully_addressable or small.is_fully_replicated:
            np.asarray(small)
        else:
            jax.block_until_ready(small)
        return carry

    # -- persistence -------------------------------------------------------
    def save(
        self,
        file: Union[str, TextIO],
        archive: bool = True,
        compress: bool = True,
        **kwargs,
    ) -> None:
        """Save ``results`` to ``.npz``/``.npy``.
        Parity: ``analysis/base.py:174-210``."""

        data = {
            key: np.asarray(value)
            if isinstance(value, jax.Array)
            else value
            for key, value in self.results.items()
        }
        if archive and compress:
            np.savez_compressed(file, **data, **kwargs)
        elif archive:
            np.savez(file, **data, **kwargs)
        else:
            for key, value in data.items():
                np.save(f"{file}_{key}", value, **kwargs)


class NumbaAnalysisBase(SerialAnalysisBase):
    """Parity shim for the reference's Numba-threaded base
    (``analysis/base.py:212-279``).  XLA owns the device thread pool,
    so ``n_threads`` is accepted and ignored."""

    def run(
        self,
        start: int = None,
        stop: int = None,
        step: int = None,
        frames=None,
        n_threads: int = None,
        verbose: bool = None,
        **kwargs,
    ) -> "NumbaAnalysisBase":
        if n_threads is not None:
            import warnings

            warnings.warn(
                "n_threads is accepted for API parity but ignored: "
                "XLA manages device parallelism (like the n_batches "
                "no-op).",
                stacklevel=2,
            )
        return super().run(
            start=start, stop=stop, step=step, frames=frames,
            verbose=verbose, **kwargs,
        )


#: Honest name for the jit-compiled single-device base.
JittedAnalysisBase = NumbaAnalysisBase


class ParallelAnalysisBase(SerialAnalysisBase):
    """Frame-parallel analysis over a device mesh.

    The reference's ``ParallelAnalysisBase`` (``analysis/base.py:281-
    507``) forks multiprocessing/joblib/dask workers that each re-open
    the trajectory and re-run ``_single_frame_parallel``; results are
    merged on the driver.  Here the same split–apply–combine happens
    inside XLA: each coordinate chunk's frame axis is sharded across
    the mesh, every device folds its sub-batch into the (replicated)
    carry, and the implied ``psum`` rides the ICI links.
    """

    def __init__(self, trajectory, verbose: bool = False, **kwargs):
        super().__init__(trajectory, verbose, **kwargs)
        self._n_jobs = None

    def _n_shards(self) -> int:
        available = len(jax.devices())
        n = self._n_jobs or available
        return max(1, min(n, available, self.n_frames or 1))

    def _single_frame_parallel(self, frame: int, index: int):
        """Per-frame worker hook retained for user subclasses that port
        reference-style analyses."""

        raise NotImplementedError

    def run(
        self,
        start: int = None,
        stop: int = None,
        step: int = None,
        frames=None,
        verbose: bool = None,
        n_jobs: int = None,
        module: str = None,
        block: bool = True,
        method: str = None,
        **kwargs,
    ) -> "ParallelAnalysisBase":
        if module not in (None, "multiprocessing", "joblib", "dask"):
            raise ValueError(f"Invalid parallelization module: {module}.")
        if module is not None:
            logging.debug(
                f"module={module!r} is accepted for API compatibility; "
                "execution is sharded over the XLA device mesh."
            )
        self._n_jobs = n_jobs
        return super().run(
            start=start, stop=stop, step=step, frames=frames,
            verbose=verbose, **kwargs,
        )


class DynamicAnalysisBase(ParallelAnalysisBase, SerialAnalysisBase):
    """Serial/parallel-switchable base.
    Parity: ``analysis/base.py:509-584``."""

    def __init__(
        self, trajectory, parallel: bool, verbose: bool = False, **kwargs
    ):
        self._parallel = parallel
        (ParallelAnalysisBase if parallel else SerialAnalysisBase).__init__(
            self, trajectory, verbose=verbose, **kwargs
        )

    def _n_shards(self) -> int:
        if self._parallel:
            return ParallelAnalysisBase._n_shards(self)
        return 1

    def run(
        self,
        start: int = None,
        stop: int = None,
        step: int = None,
        frames=None,
        verbose: bool = None,
        **kwargs,
    ):
        base = ParallelAnalysisBase if self._parallel else SerialAnalysisBase
        return base.run(
            self, start=start, stop=stop, step=step, frames=frames,
            verbose=verbose, **kwargs,
        )
