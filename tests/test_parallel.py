"""Multi-device sharded tile-batch tests on the 8-device virtual CPU mesh
(the analogue of the reference's single-host `mpiexec -np 4` MPI tests)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nemo_tpu.parallel import distribute, mesh as mesh_mod
from nemo_tpu.ops import fourier


def _make_batch(nTiles, nf, ny, nx, seed=0):
    rng = np.random.default_rng(seed)
    data = rng.normal(0, 30, (nTiles, nf, ny, nx))
    # inject one strong source at the centre of each tile
    for t in range(nTiles):
        yy, xx = np.mgrid[0:ny, 0:nx]
        blob = 500 * np.exp(-((yy - ny // 2) ** 2 + (xx - nx // 2) ** 2)
                            / (2 * 2.0 ** 2))
        data[t] += blob[None]
    noise = rng.normal(0, 30, (nTiles, nf, ny, nx))
    # unit-peak Gaussian template per tile/freq
    yy, xx = np.mgrid[0:ny, 0:nx]
    tmpl = np.exp(-((yy - ny / 2) ** 2 + (xx - nx / 2) ** 2)
                  / (2 * 2.0 ** 2))
    fsignal = np.broadcast_to(tmpl, (nTiles, nf, ny, nx)).copy()
    return data, noise, fsignal


def test_sharded_tile_step_runs_on_mesh():
    devices = jax.devices()
    assert len(devices) == 8, "conftest should provide 8 virtual devices"
    m = mesh_mod.get_mesh()
    nTiles, nf, ny, nx = 8, 2, 128, 128
    data, noise, fsignal = _make_batch(nTiles, nf, ny, nx)
    w = np.ones(nf)
    apodM = np.asarray(fourier.apod_mask((ny, nx), 10))
    psMask = np.ones((nTiles, ny, nx))
    surveyMask = np.ones((nTiles, ny, nx))
    out = distribute.run_tile_batch(data, noise, fsignal, w, apodM, psMask,
                                    surveyMask, gridSize=32, trimPix=0,
                                    mesh=m, topK=16, threshold=4.0)
    SNMap = np.asarray(out["SNMap"])
    assert SNMap.shape == (nTiles, ny, nx)
    # every tile's injected source should be its top peak, at the centre
    peakYs = np.asarray(out["peakYs"])
    peakXs = np.asarray(out["peakXs"])
    peakVals = np.asarray(out["peakVals"])
    for t in range(nTiles):
        assert peakVals[t, 0] > 5
        assert abs(int(peakYs[t, 0]) - ny // 2) <= 1
        assert abs(int(peakXs[t, 0]) - nx // 2) <= 1
    # survey stats are replicated psums
    assert int(out["surveyCandidateCount"]) >= nTiles
    assert np.asarray(out["surveyRMSHist"]).sum() > 0


def test_sharded_matches_single_device():
    m8 = mesh_mod.get_mesh()
    m1 = mesh_mod.get_mesh(n_devices=1)
    nTiles, nf, ny, nx = 8, 1, 96, 96
    data, noise, fsignal = _make_batch(nTiles, nf, ny, nx, seed=3)
    w = np.ones(nf)
    apodM = np.asarray(fourier.apod_mask((ny, nx), 10))
    psMask = np.ones((nTiles, ny, nx))
    surveyMask = np.ones((nTiles, ny, nx))
    out8 = distribute.run_tile_batch(data, noise, fsignal, w, apodM, psMask,
                                     surveyMask, gridSize=32, trimPix=0,
                                     mesh=m8, topK=8)
    out1 = distribute.run_tile_batch(data, noise, fsignal, w, apodM, psMask,
                                     surveyMask, gridSize=32, trimPix=0,
                                     mesh=m1, topK=8)
    np.testing.assert_allclose(np.asarray(out8["SNMap"]),
                               np.asarray(out1["SNMap"]), rtol=1e-8,
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(out8["surveyRMSHist"]),
                               np.asarray(out1["surveyRMSHist"]))


def test_background_writer_per_file_errors(tmp_path):
    """A failed background cache write is charged to ITS file only:
    readers of other files see no error, and the failing file's reader
    gets a hard error instead of a silent fallback/rebuild."""
    import os

    import numpy as np
    import pytest

    from nemo_tpu.parallel.filtercache import BackgroundFITSWriter
    from nemo_tpu.utils import fits as nfits

    w = BackgroundFITSWriter()
    good = str(tmp_path / "sub" / "good.fits")
    blocker = str(tmp_path / "blocker")
    open(blocker, "w").write("x")          # a FILE where a dir is needed
    bad = os.path.join(blocker, "sub", "bad.fits")
    w.enqueue(good, np.ones((4, 4)), nfits.Header())
    w.enqueue(bad, np.ones((4, 4)), nfits.Header())
    w.ensure_written(good)                 # must NOT raise
    assert os.path.exists(good)
    with pytest.raises(RuntimeError, match="bad.fits"):
        w.ensure_written(bad)
    w.flush()                              # bad's error already consumed


def test_production_step_filter_matches_host_core_two_freq():
    """The production step's built filter must equal the host engine's
    _build_filter_core on 2-frequency inputs.  Regression for the
    covariance floor: ~half the OFF-DIAGONAL covariance values are
    negative, and the step's max(dataMap,CMB) floor (maximum(prods, fg))
    once used fg = 0 for plain dataMap noise, silently clipping them -
    every 2-freq matched filter was skewed ~0.2% at peaks while all
    single-freq tests stayed exact.  The no-floor sentinel is -inf."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _example_inputs
    from nemo_tpu import filters
    from nemo_tpu.ops import noise as noise_ops
    from nemo_tpu.parallel import distribute
    from nemo_tpu.parallel.mesh import get_mesh, tile_sharding

    mesh = get_mesh(n_devices=1)
    sh = tile_sharding(mesh)
    nT, nf, ny, nx = 1, 2, 128, 128
    gridSize = 32
    data, noise, tmpl, w, apodM, psMask, surveyMask = _example_inputs(
        nT, nf, ny, nx, np.float64, seed=13)
    # decorrelate the bands so cross-covariance genuinely goes negative
    rng = np.random.default_rng(14)
    noise = jnp.asarray(np.asarray(noise)
                        + rng.normal(0, 30, noise.shape))
    fNoise = jnp.fft.rfft2(noise[0] * apodM[None])
    offDiag = np.asarray(jnp.real(fNoise[0] * jnp.conj(fNoise[1])))
    assert (offDiag < 0).mean() > 0.3   # the premise of the regression

    hostFilt = np.asarray(filters._build_filter_core(
        noise[0], jnp.abs(jnp.fft.rfft2(tmpl[0])), w, apodM, (ny, nx)))

    fg = jnp.full((nT, ny, nx // 2 + 1), -jnp.inf)
    peakYX = jnp.full((nT, 2), ny // 2, dtype=jnp.int32)
    apodT = jnp.broadcast_to(apodM, (nT, ny, nx))
    meta = noise_ops.cell_meta_batch([(ny, nx)] * nT, (ny, nx), gridSize)
    metaDev = {k: jax.device_put(jnp.asarray(v), sh)
               for k, v in meta.items()}
    step = distribute.make_sharded_matched_filter_step(
        mesh, gridSize, 0, lean_outputs=True, return_filter=True)
    out = step(jax.device_put(data, sh), jax.device_put(noise, sh),
               jax.device_put(tmpl, sh), jax.device_put(tmpl, sh), w,
               jax.device_put(apodT, sh), jax.device_put(psMask, sh),
               jax.device_put(surveyMask, sh),
               jax.device_put(fg, sh), jax.device_put(peakYX, sh),
               metaDev)
    stepFilt = np.asarray(out["filt"][0])
    np.testing.assert_allclose(stepFilt, hostFilt, rtol=1e-9,
                               atol=1e-9 * np.abs(hostFilt).max())


def test_given_filter_step_matches_build_step():
    """The given-filter step (cached-filter reruns) applied with the
    build step's own returned filter reproduces the build step's
    filtered map exactly."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _example_inputs
    from nemo_tpu.parallel import distribute
    from nemo_tpu.parallel.mesh import get_mesh, tile_sharding

    mesh = get_mesh(n_devices=2)
    sh = tile_sharding(mesh)
    nT, nf, ny, nx = 2, 2, 128, 128
    gridSize, trimPix = 32, 0
    data, noise, tmpl, w, apodM, psMask, surveyMask = _example_inputs(
        nT, nf, ny, nx, np.float64, seed=7)
    apodT = jnp.broadcast_to(apodM, (nT, ny, nx))
    fg = jnp.full((nT, ny, nx // 2 + 1), -jnp.inf)  # no CMB floor
    peakYX = jnp.full((nT, 2), ny // 2, dtype=jnp.int32)

    from nemo_tpu.ops import noise as noise_ops
    meta = noise_ops.cell_meta_batch([(ny, nx)] * nT, (ny, nx), gridSize)
    metaDev = {k: jax.device_put(jnp.asarray(v), sh)
               for k, v in meta.items()}

    build = distribute.make_sharded_matched_filter_step(
        mesh, gridSize, trimPix, lean_outputs=True, return_filter=True)
    outB = build(jax.device_put(data, sh), jax.device_put(noise, sh),
                 jax.device_put(tmpl, sh), jax.device_put(tmpl, sh), w,
                 jax.device_put(apodT, sh), jax.device_put(psMask, sh),
                 jax.device_put(surveyMask, sh),
                 jax.device_put(fg, sh), jax.device_put(peakYX, sh),
                 metaDev)

    given = distribute.make_sharded_matched_filter_step(
        mesh, gridSize, trimPix, lean_outputs=True, given_filter=True)
    outG = given(jax.device_put(data, sh),
                 jax.device_put(outB["filt"], sh),
                 jax.device_put(apodT, sh), jax.device_put(psMask, sh),
                 jax.device_put(surveyMask, sh), metaDev)

    np.testing.assert_allclose(np.asarray(outG["filtered"]),
                               np.asarray(outB["filtered"]),
                               rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(np.asarray(outG["RMSCells"]),
                               np.asarray(outB["RMSCells"]),
                               rtol=1e-12, atol=1e-16)
    assert np.array_equal(np.asarray(outG["surveyMask"]),
                          np.asarray(outB["surveyMask"]))


def test_multihost_skeleton_single_process():
    """Multi-host runtime primitives (parallel/multihost.py): inert by
    default (no distributed init on single-host runs), coordinator
    gating true, and the local tile slice is everything when one
    process addresses the whole mesh - the contracts the engine relies
    on if NEMO_TPU_MULTIHOST=1 ever spans real hosts."""
    import os
    from nemo_tpu.parallel import mesh as mesh_mod
    from nemo_tpu.parallel import multihost

    assert os.environ.get("NEMO_TPU_MULTIHOST", "") in ("", "0")
    assert multihost.multihost_requested() is False
    assert multihost.initialize_from_env() is False   # no-op, no crash
    assert multihost.is_coordinator() is True
    m = mesh_mod.get_mesh(n_devices=8)
    names = ["t%d" % i for i in range(20)]
    assert multihost.local_tile_slice(names, m) == names
