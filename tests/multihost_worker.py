"""Worker for tests/test_multihost.py: one process of a 2-process CPU
'multi-host' cluster (4 virtual devices each), running 2 DP train steps over
the global 8-device mesh via jax.distributed. Must run in a FRESH process
(jax.distributed can't initialize after jax is already in use)."""

import os
import sys

proc_id = int(sys.argv[1])
port = sys.argv[2]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=proc_id
)

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from littlegan_tpu.config import Config
from littlegan_tpu.data.synthetic import random_device_batch
from littlegan_tpu.parallel import make_mesh, make_parallel_train_step, replicate_state, shard_batch
from littlegan_tpu.training import create_train_state

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())

cfg = Config(
    batch_size=8, image_dim=16, init_dim=1, noise_dim=13,
    conv_filter=[24, 16, 12, 8, 4], compute_dtype="float32",
    donate_state=False, debug=True,
)
mesh = make_mesh(8)
state = replicate_state(create_train_state(cfg, jax.random.PRNGKey(0)), mesh)
step = make_parallel_train_step(cfg, state.params, mesh, donate=False)
ks = jax.random.split(jax.random.PRNGKey(1), 2)
b1 = shard_batch(random_device_batch(cfg, ks[0]), mesh)
b2 = shard_batch(random_device_batch(cfg, ks[1]), mesh)
out = None
for i in range(2):
    out = step(state, b1, b2, jax.random.PRNGKey(2), jnp.int32(i + 11))
    state = out.state
m = jax.device_get(out.metrics)
print(
    f"MULTIHOST_OK proc={proc_id} "
    + " ".join(f"{k}={float(v):.6f}" for k, v in sorted(m.items()))
)
