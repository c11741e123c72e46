"""True multi-process tests: 2 and 4 OS processes join one JAX system over
a localhost coordinator, build a GLOBAL mesh spanning every process's CPU
devices, and run the sharded decode stage on globally-distributed arrays.

This is the CPU-mesh stand-in for an N-host TPU pod (SURVEY.md §4: multi-
host logic must be testable without TPU hardware). Cases:

  * test_multiprocess_global_mesh[2] / [4] — pure DP: the batched device
    stage sharded over the global "data" axis, output bit-compared to the
    single-device stage.
  * test_four_process_dp_sp_mesh — the combined DP x SP shape that
    __graft_entry__.dryrun_multichip compiles, but truly multi-process:
    a (data=4, stripe=2) mesh over 4 processes x 2 devices, stripe-halo
    ppermute for fancy upsampling inside shard_map, plus the FDCT
    re-encode leg; RGB allgathered and bit-compared to a local
    single-process (1 x 2) stripe reference.

If the coordination service cannot start in this environment the tests
skip, not hang (hard wall-clock deadline per process).
"""

import socket
import subprocess
import sys
import textwrap
import time
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow  # quick tier: pytest -m 'not slow'

REPO = Path(__file__).resolve().parent.parent

PRELUDE = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=%(local_devices)d"
    )
    import jax
    jax.config.update("jax_platforms", "cpu")

    port, pid = sys.argv[1], int(sys.argv[2])
    NPROC = %(nproc)d
    from jpeg_decoder_tpu.parallel import multihost
    multihost.initialize(f"localhost:{port}", num_processes=NPROC,
                         process_id=pid)
    assert jax.process_count() == NPROC, jax.process_count()
    assert jax.device_count() == %(local_devices)d * NPROC, jax.device_count()

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax.experimental import multihost_utils

    from jpeg_decoder_tpu.models import encoder
    from jpeg_decoder_tpu.models.decoder import (
        _stage_key, build_stage_raw, _entropy_decode)
    from jpeg_decoder_tpu.io.parser import parse
    from jpeg_decoder_tpu.parallel import mesh as mesh_mod
    from jpeg_decoder_tpu.utils.config import (
        DecodeConfig, EntropyBackend, EncodeConfig, IdctPrecision)
    """
)

DP_BODY = textwrap.dedent(
    """
    cfg = DecodeConfig(entropy_backend=EntropyBackend.NUMPY)
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    data = encoder.encode(img, EncodeConfig(quality=85))
    s = parse(data, cfg)
    planes, qts = _entropy_decode(s, cfg)
    qtb = tuple(np.ascontiguousarray(qts[c.qtid], dtype=np.uint16).tobytes()
                for c in s.frame.components)
    key = _stage_key(s.frame, qtb, cfg)
    raw = build_stage_raw(key)

    n_dev = jax.device_count()
    m = mesh_mod.make_mesh(n_data=n_dev)  # GLOBAL mesh across processes
    sh = mesh_mod.batch_sharding(m)
    batched = jax.jit(
        jax.vmap(lambda *p: raw(*p)[0]),
        in_shardings=(sh,) * s.frame.ncs,
        out_shardings=sh,
    )
    B_LOCAL = n_dev // NPROC  # one image per device
    host_batches = [
        np.stack([planes.plane(ci)] * B_LOCAL) for ci in range(s.frame.ncs)
    ]
    gb = [
        multihost_utils.host_local_array_to_global_array(
            h, m, P(mesh_mod.DATA_AXIS)
        )
        for h in host_batches
    ]
    out = batched(*gb)
    out_host = multihost_utils.global_array_to_host_local_array(
        out, m, P(mesh_mod.DATA_AXIS)
    )
    want = np.asarray(jax.device_get(jax.jit(lambda *p: raw(*p)[0])(
        *[jnp.asarray(planes.plane(ci)) for ci in range(s.frame.ncs)]
    )))
    got = np.asarray(out_host)
    assert got.shape[0] == B_LOCAL
    assert np.array_equal(got[0], want), "distributed decode differs"
    print(f"OK process {pid}")
    """
)

DP_SP_BODY = textwrap.dedent(
    """
    # Combined DP x SP: (data=4, stripe=2) global mesh over 4 processes x
    # 2 devices — the dryrun_multichip shape, truly multi-process. The
    # stripe axis exchanges fancy-upsample halo rows via ppermute inside
    # shard_map; the data axis is the batch.
    from jpeg_decoder_tpu.models import decoder as decoder_mod
    from jpeg_decoder_tpu.parallel import stripes as stripes_mod

    N_STRIPE, N_DATA = 2, 4
    cfg = DecodeConfig(
        entropy_backend=EntropyBackend.NUMPY,
        idct_precision=IdctPrecision.FLOAT32,
        upsample="fancy",
    )
    rng = np.random.default_rng(1234)
    img = rng.integers(0, 256, (16 * N_STRIPE, 32, 3), dtype=np.uint8)
    data = encoder.encode(img, EncodeConfig(quality=85, subsampling="420"))
    s = parse(data, cfg)
    planes, qts = _entropy_decode(s, cfg)
    frame = s.frame
    key = _stage_key(frame, decoder_mod.qt_by_comp_bytes(frame, qts), cfg)
    shard_fn = stripes_mod.make_shard_fn(key, N_STRIPE)
    coeffs = [planes.plane(ci) for ci in range(frame.ncs)]
    B = N_DATA * 2  # two images per data shard
    full_np = [np.stack([c] * B) for c in coeffs]

    mesh = mesh_mod.make_mesh(n_data=N_DATA, n_stripe=N_STRIPE)
    dp_sp = P(mesh_mod.DATA_AXIS, mesh_mod.STRIPE_AXIS)
    sharding = NamedSharding(mesh, dp_sp)

    def per_shard(*cb):
        return jax.vmap(shard_fn)(*cb)

    mapped = jax.jit(jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(dp_sp,) * frame.ncs, out_specs=dp_sp,
    ))
    gargs = [
        jax.make_array_from_callback(
            f.shape, sharding, lambda idx, f=f: f[idx]
        )
        for f in full_np
    ]
    rgb = mapped(*gargs)
    jax.block_until_ready(rgb)
    assert rgb.shape[0] == B and rgb.shape[-1] == 3, rgb.shape
    got = multihost_utils.process_allgather(rgb, tiled=True)

    # Local single-process reference: same stripe program on a (1 x 2)
    # mesh over this process's own devices — halo exchange spans only the
    # stripe axis, so the result must be identical.
    local_mesh = mesh_mod.make_mesh(
        n_data=1, n_stripe=N_STRIPE, devices=jax.local_devices()
    )
    local_mapped = jax.jit(jax.shard_map(
        per_shard, mesh=local_mesh,
        in_specs=(dp_sp,) * frame.ncs, out_specs=dp_sp,
    ))
    local_sh = NamedSharding(local_mesh, dp_sp)
    want = np.asarray(jax.device_get(local_mapped(
        *[jax.device_put(f, local_sh) for f in full_np]
    )))
    assert np.array_equal(np.asarray(got), want), "DPxSP decode differs"
    print(f"OK process {pid}")
    """
)


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers(tmp_path, body: str, nproc: int, local_devices: int,
                 deadline_s: float = 240.0):
    script_text = PRELUDE % {
        "nproc": nproc, "local_devices": local_devices
    } + body
    deadline = time.monotonic() + deadline_s
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(script_text)
    env = {
        "PATH": "/usr/bin:/bin:/usr/local/bin",
        "PYTHONPATH": str(REPO),
        "HOME": "/root",
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(port), str(pid)],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in range(nproc)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(
                timeout=max(1.0, deadline - time.monotonic())
            )
            outs.append((p.returncode, out, err))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("multi-process coordination timed out in this environment")
    for rc, out, err in outs:
        if rc != 0 and "UNAVAILABLE" in err:
            pytest.skip("coordination service unavailable")
        assert rc == 0, f"worker failed:\n{err[-3000:]}"
        assert "OK process" in out


@pytest.mark.parametrize("nproc", [2, 4])
def test_multiprocess_global_mesh(tmp_path, nproc):
    # 8 global devices regardless of process count: 2x4 or 4x2.
    _run_workers(tmp_path, DP_BODY, nproc=nproc, local_devices=8 // nproc)


def test_four_process_dp_sp_mesh(tmp_path):
    _run_workers(tmp_path, DP_SP_BODY, nproc=4, local_devices=2)
