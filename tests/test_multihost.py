"""Multi-host (DCN) scaffold smoke test: two real jax.distributed
processes on the CPU backend (4 virtual devices each -> one 8-device
global mesh), each reading only its own frame shard, must reproduce the
single-process NumPy oracle bit-exactly.  The TPU-native replacement
for the reference's dask.distributed backend
(`/root/reference/src/mdhelper/analysis/base.py:396-448`)."""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent(
    f"""
    import sys

    sys.path.insert(0, {REPO_ROOT!r})
    """
) + textwrap.dedent(
    """
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    ckpt_dir = sys.argv[4]

    from mdhelper_tpu.parallel.mesh import initialize_distributed

    initialize_distributed(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc
    assert len(jax.devices()) == 4 * nproc

    import numpy as np

    from mdhelper_tpu.analysis import structure
    from mdhelper_tpu.core import Universe

    BOX, N_FRAMES, N = 10.0, 11, 37  # deliberately awkward sizes
    rng = np.random.default_rng(42)  # identical data on every host
    positions = rng.random((N_FRAMES, N, 3)) * BOX
    universe = Universe.from_arrays(
        positions, np.array([BOX] * 3),
        types=np.array(["A"] * N, dtype=object), masses=np.ones(N),
    )
    ag = universe.select_atoms("type A")

    rdf = structure.RadialDistributionFunction(
        ag, n_bins=32, range=(0.0, 4.5), exclusion=(1, 1),
        parallel=True, verbose=False,
    ).run()

    # Independent oracle.
    expected = np.zeros(32)
    for f in range(N_FRAMES):
        delta = positions[f][:, None] - positions[f][None, :]
        delta -= BOX * np.round(delta / BOX)
        dist = np.sqrt((delta**2).sum(-1))
        i = np.arange(N)
        dist = dist[i[:, None] != i[None, :]]
        expected += np.histogram(dist, bins=32, range=(0.0, 4.5))[0]
    np.testing.assert_array_equal(rdf.results.counts, expected)

    sf = structure.StructureFactor(
        ag, n_points=4, parallel=True, verbose=False
    ).run()
    assert np.isfinite(sf.results.ssf).all()

    # Large-|q| limit of an ideal gas -> S(q) ~ 1.
    tail = sf.results.ssf[0, sf.results.wavenumbers > 2.0]
    assert abs(tail.mean() - 1.0) < 0.35

    # Padded FINAL chunk across hosts: 4-frame chunks over 11 frames
    # leave a 3-frame tail chunk that pads to the 8-device mesh (the
    # classic multi-host divergence case).
    rdf_chunked = structure.RadialDistributionFunction(
        ag, n_bins=32, range=(0.0, 4.5), exclusion=(1, 1),
        parallel=True, verbose=False,
    )
    rdf_chunked._chunk_bytes = 4 * N * 3 * 8
    rdf_chunked.run()
    np.testing.assert_array_equal(
        rdf_chunked.results.counts, expected
    )

    # q-sharded S(q): the wavevector axis sharded over the global
    # mesh with replicated frame chunks, vs the frame-sharded run of
    # the same direct sweep.
    kwargs = dict(
        n_points=4, method="direct", sort=False, unique=False,
        verbose=False,
    )
    sfq = structure.StructureFactor(ag, shard="q", **kwargs).run()
    sff = structure.StructureFactor(
        ag, parallel=True, **kwargs
    ).run()
    np.testing.assert_allclose(
        sfq.results.ssf, sff.results.ssf, rtol=1e-9
    )

    # Atom-sharded ppermute ring over the global mesh (replicated
    # frame chunks, group-2 shards rotating across DCN).
    rdf_ring = structure.RadialDistributionFunction(
        ag, n_bins=32, range=(0.0, 4.5), exclusion=(1, 1),
        shard="atoms", verbose=False,
    ).run()
    np.testing.assert_array_equal(rdf_ring.results.counts, expected)

    # Store-type analysis across hosts: per-frame dipole stores from
    # a frame-sharded stream, re-assembled in frame order (chunked so
    # the final chunk pads).
    from mdhelper_tpu.analysis.electrostatics import DipoleMoment

    charges = rng.standard_normal(N)
    u_q = Universe.from_arrays(
        positions, np.array([BOX] * 3),
        types=np.array(["A"] * N, dtype=object),
        masses=np.ones(N), charges=charges,
    )
    dm = DipoleMoment(u_q.atoms, parallel=True, verbose=False)
    dm._chunk_bytes = 4 * N * 3 * 8
    dm.run()
    ref_dipoles = np.einsum("a,tad->td", charges, positions)
    np.testing.assert_allclose(
        dm.results.dipoles[:, 0], ref_dipoles, rtol=1e-9, atol=1e-9
    )

    # Kill-and-resume of a store-type analysis ACROSS HOSTS (round
    # 5): a checkpointed partial run stopping mid-stream, then a
    # fresh instance resuming from the checkpoint, must reproduce
    # the uninterrupted run exactly.  Per-host checkpoint files;
    # store extras are re-assembled globally every chunk via
    # parallel.mesh.fetch_global, so each host's checkpoint holds
    # the FULL store and the resume's straddling chunk (stop=6 with
    # 4-frame chunks -> resume chunk [4..7] masks frames 4-5) must
    # not double-count on either host.
    import os as _os

    ckpt = _os.path.join(ckpt_dir, f"dm_{pid}.npz")

    def dm_new():
        a = DipoleMoment(u_q.atoms, parallel=True, verbose=False)
        a._chunk_bytes = 4 * N * 3 * 8
        return a

    dm_new().run(stop=6, checkpoint=ckpt)
    assert _os.path.exists(ckpt)
    resumed = dm_new().run(checkpoint=ckpt)
    np.testing.assert_array_equal(
        np.asarray(resumed.results.dipoles),
        np.asarray(dm.results.dipoles),
    )

    print(f"proc {pid} OK", flush=True)
    """
)


def test_two_process_frame_sharding(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)

    with socket.socket() as sock:
        sock.bind(("127.0.0.1", 0))
        port = sock.getsockname()[1]

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    procs = [
        subprocess.Popen(
            [
                sys.executable, str(script), str(i), "2",
                str(port), str(tmp_path),
            ],
            env=env,
            cwd=os.path.dirname(os.path.dirname(__file__)),
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outputs = [p.communicate(timeout=300)[0] for p in procs]
    for i, (proc, out) in enumerate(zip(procs, outputs)):
        assert proc.returncode == 0, f"process {i} failed:\n{out}"
        assert f"proc {i} OK" in out
