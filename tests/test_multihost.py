"""Multi-host launch validation: 2 coordinated processes, each with 2
virtual CPU devices, forming a global (dp=2 over "DCN", tp=2 over "ICI")
mesh — the SURVEY §2.7 multi-host configuration, simulated the only way a
1-chip environment allows. Each process loads the same synthesized model,
shards params globally (shard_params_multihost / put_global), runs a jitted
sharded prefill, and checks its addressable logits shard against the
single-process reference.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import os, sys
port, model_dir, pid = sys.argv[1], sys.argv[2], int(sys.argv[3])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=2, process_id=pid)
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

sys.path.insert(0, os.getcwd())
from uzu_tpu import LanguageModel
from uzu_tpu.models.decoder import decoder_forward
from uzu_tpu.parallel.distributed import put_global, shard_params_multihost
from uzu_tpu.parallel.mesh import DP_AXIS, TP_AXIS

devs = jax.devices()
assert len(devs) == 4 and jax.process_count() == 2
mesh = Mesh(np.asarray(devs).reshape(2, 2), (DP_AXIS, TP_AXIS))

lm = LanguageModel.from_dir(model_dir, max_context=64, prefill_buckets=(16,))
cfg = lm.decoder_config
params = shard_params_multihost(cfg, lm.params, mesh)

# one sequence per dp replica: batch dim sharded over dp ("DCN")
toks = np.stack([(np.arange(16) * 5) % 256, (np.arange(16) * 11) % 256]).astype(np.int32)
from uzu_tpu.parallel.sharding import state_specs
states = jax.tree.map(lambda *xs: jnp.stack(xs), *[lm.new_state() for _ in range(2)])
state_sp = state_specs(cfg, states, mesh, batched=True)
states = jax.tree.map(
    lambda leaf, ns: put_global(np.asarray(leaf), mesh, ns.spec), states, state_sp
)
toks_g = put_global(toks, mesh, P(DP_AXIS, None))

@jax.jit
def step(p, t, st):
    def one(t_i, s_i):
        logits, s_i = decoder_forward(cfg, p, t_i, s_i, true_length=12)
        return logits[0], s_i
    return jax.vmap(one)(t, st)

logits, states = step(params, toks_g, states)

# reference: single-process forward of THIS replica's sequence
my_rep = jax.process_index()
want, _ = lm.prefill(lm.new_state(), toks[my_rep][:12])

for shard in logits.addressable_shards:
    rep = shard.index[0].start or 0
    got = np.asarray(shard.data)[0]
    ref = want if rep == my_rep else None
    if rep == my_rep:
        np.testing.assert_allclose(got, np.asarray(want), rtol=2e-3, atol=2e-3)
print(f"pid{pid} OK", flush=True)
"""


SHARDED_LOAD_WORKER = r"""
import os, sys
port, model_dir, pid = sys.argv[1], sys.argv[2], int(sys.argv[3])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=2, process_id=pid)
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

sys.path.insert(0, os.getcwd())
from uzu_tpu import LanguageModel
from uzu_tpu.models.decoder import decoder_forward
from uzu_tpu.parallel.mesh import DP_AXIS, TP_AXIS

devs = jax.devices()
assert len(devs) == 4 and jax.process_count() == 2
mesh = Mesh(np.asarray(devs).reshape(2, 2), (DP_AXIS, TP_AXIS))

# streamed sharded load: the full tree must never materialize per process
lm = LanguageModel.from_dir_sharded(model_dir, mesh, max_context=64,
                                    prefill_buckets=(16,))
stats = lm.shard_load_stats
assert stats["peak_group_host_bytes"] < 0.5 * stats["total_file_bytes"], stats
# spot-check an attention projection is actually TP-sharded on device
qkv = lm.params["layers"][0]["mixer"]["qkv"]["w"]
leaf = jax.tree.leaves(qkv)[0]
shard0 = leaf.addressable_shards[0].data
assert shard0.shape != leaf.shape, (shard0.shape, leaf.shape)

# correctness: sharded-load prefill logits == single-process full load
toks = ((np.arange(16) * 7) % 256).astype(np.int32)
cfg = lm.decoder_config
from uzu_tpu.parallel.distributed import put_global
from uzu_tpu.parallel.sharding import state_specs
states = jax.tree.map(lambda *xs: jnp.stack(xs), *[lm.new_state() for _ in range(2)])
state_sp = state_specs(cfg, states, mesh, batched=True)
states = jax.tree.map(
    lambda leaf, ns: put_global(np.asarray(leaf), mesh, ns.spec), states, state_sp
)
toks_g = put_global(np.stack([toks, toks]), mesh, P(DP_AXIS, None))

@jax.jit
def step(p, t, st):
    def one(t_i, s_i):
        logits, s_i = decoder_forward(cfg, p, t_i, s_i, true_length=12)
        return logits[0], s_i
    return jax.vmap(one)(t, st)

logits, _ = step(lm.params, toks_g, states)

ref_lm = LanguageModel.from_dir(model_dir, max_context=64, prefill_buckets=(16,))
want, _ = ref_lm.prefill(ref_lm.new_state(), toks[:12])
for shard in logits.addressable_shards:
    got = np.asarray(shard.data)[0]
    np.testing.assert_allclose(got, np.asarray(want), rtol=2e-3, atol=2e-3)
print(f"pid{pid} OK", flush=True)
"""


def _run_two_process(script_text: str, model_dir: str, tmp_path) -> None:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    script = tmp_path / "worker.py"
    script.write_text(script_text)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(port), model_dir, str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd=repo, env=env, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=280)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"pid{pid} failed:\n{out[-3000:]}"
        assert f"pid{pid} OK" in out


def test_two_process_dp_over_dcn(tmp_path):
    from uzu_tpu.tools.synth import llama_config, synthesize

    cfg = llama_config(num_layers=2, model_dim=64, hidden_dim=128, num_heads=4,
                       num_groups=2, head_dim=16, vocab_size=256)
    d = synthesize(cfg, str(tmp_path / "mh_model"), seed=4, dtype=np.float32)
    _run_two_process(WORKER, d, tmp_path)


def test_two_process_sharded_load(tmp_path):
    """VERDICT r3 #8: per-process streamed sharded weight loading — each
    process's peak host bytes stay well under the full model size, the
    resulting tree is TP-sharded, and logits match a single-process load."""
    from uzu_tpu.tools.synth import llama_config, synthesize

    cfg = llama_config(num_layers=4, model_dim=64, hidden_dim=128, num_heads=4,
                       num_groups=2, head_dim=16, vocab_size=256)
    d = synthesize(cfg, str(tmp_path / "mh_sharded"), seed=9, dtype=np.float32)
    _run_two_process(SHARDED_LOAD_WORKER, d, tmp_path)
