"""Worker for the two-process multi-host test (launched by
tests/test_distributed.py with JAX_PROCESS_ID=0/1).

Validates the reference's Horovod semantics (`classification_part/
training.py:43-66,122-156`) on a real multi-process JAX runtime:

  * `jax.distributed.initialize` bring-up over a TCP coordinator;
  * a global mesh spanning both processes' devices, batch sharded on `data`
    with each host contributing only its local shard
    (`jax.make_array_from_process_local_data`) — deterministic per-host data
    sharding, improving on the reference's independent-shuffle approximation
    (SURVEY.md §5.8);
  * gradient all-reduce through the sharded train step: both processes must
    observe the SAME loss and parameter update;
  * process-0 gating (`is_primary_process`);
  * `CheckpointManager.save` entered by EVERY process (orbax multi-host
    contract) followed by a restore.

Prints one machine-checkable line: MULTIHOST_OK <loss> <primary>.
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=2")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from jpeg_detection_resnet_ssd_tpu.parallel import make_mesh
from jpeg_detection_resnet_ssd_tpu.train import Trainer, classification_loss_fn
from jpeg_detection_resnet_ssd_tpu.train.checkpoints import CheckpointManager
from jpeg_detection_resnet_ssd_tpu.utils.distributed import (
    is_primary_process,
    maybe_initialize_distributed,
)


class Tiny(nn.Module):
    @nn.compact
    def __call__(self, inputs, train: bool = False):
        x = nn.relu(nn.Conv(8, (3, 3), name="conv")(inputs))
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(4, name="fc")(x)


def main():
    ckpt_dir = sys.argv[1]
    active = maybe_initialize_distributed()
    assert active, "distributed bring-up failed"
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4, jax.device_count()

    mesh = make_mesh()  # 4 x 1 over both processes
    trainer = Trainer(
        model=Tiny(),
        loss_fn=classification_loss_fn(),
        optimizer=optax.sgd(0.05, momentum=0.9),
        mesh=mesh,
        donate=False,
    )

    # Deterministic global batch of 8; each host holds rows [4*pid, 4*pid+4).
    rng = np.random.default_rng(0)
    gx = rng.normal(0, 1, (8, 12, 12, 3)).astype(np.float32)
    gl = rng.integers(0, 4, 8)
    pid = jax.process_index()
    lo, hi = 4 * pid, 4 * pid + 4

    with mesh:
        state = trainer.init_state(jax.random.PRNGKey(0), gx[:1])
        bs = trainer.batch_shardings({"inputs": 0, "labels": 0})
        batch = {
            "inputs": jax.make_array_from_process_local_data(
                bs["inputs"], gx[lo:hi], (8, 12, 12, 3)
            ),
            "labels": jax.make_array_from_process_local_data(
                bs["labels"], gl[lo:hi], (8,)
            ),
        }
        losses = []
        for _ in range(3):
            state, metrics = trainer.train_step(
                state, batch, jax.random.PRNGKey(1)
            )
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0], losses

        # all processes enter save (orbax coordinates primary-host IO)
        mgr = CheckpointManager(ckpt_dir)
        mgr.save(int(state.step), state)
        restored = mgr.restore(state)
        np.testing.assert_allclose(
            np.asarray(jax.device_get(restored.params["fc"]["bias"])),
            np.asarray(jax.device_get(state.params["fc"]["bias"])),
        )
        mgr.close()

    print(f"MULTIHOST_OK {losses[-1]:.6f} {int(is_primary_process())}")


if __name__ == "__main__":
    main()
