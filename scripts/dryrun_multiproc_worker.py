"""Worker for `__graft_entry__._multiproc_dryrun`: 2 coordinated processes
x 4 virtual CPU devices each, running ONE sharded train step of the FULL
flagship detector (ssd300_ssd_custom) over a global (4 data x 2 model)
mesh — the production dp x tp sharding brought up on a real
`jax.distributed` runtime (TCP coordinator), not just in-process virtual
devices.  Role mirror: the reference's multi-rank Horovod launch
(`classification_part/training.py:43-66`) at detection-model scale.

Launched with JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID
set; prints one machine-checkable line: MULTIPROC_OK <loss>.
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=4")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jpeg_detection_resnet_ssd_tpu.utils.compile_cache import (
    enable_persistent_cache,
)

enable_persistent_cache(
    jax,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tests", ".jax_cache"),
)

import numpy as np

from jpeg_detection_resnet_ssd_tpu.utils.distributed import (
    maybe_initialize_distributed,
)


def main():
    # Distributed bring-up FIRST: importing the model/box modules touches
    # jax (anchor precompute etc.), which would initialize the XLA backend
    # and make jax.distributed.initialize() refuse to run.
    active = maybe_initialize_distributed()
    assert active, "distributed bring-up failed"
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()

    import optax

    from jpeg_detection_resnet_ssd_tpu.boxes import AnchorSpec, TargetEncoder
    from jpeg_detection_resnet_ssd_tpu.models import (
        build_model,
        ssd_predictor_sizes,
    )
    from jpeg_detection_resnet_ssd_tpu.parallel import make_mesh
    from jpeg_detection_resnet_ssd_tpu.parallel.mesh import (
        tensor_parallel_rule,
    )
    from jpeg_detection_resnet_ssd_tpu.train import Trainer, detection_loss_fn

    mesh = make_mesh(n_data=4, n_model=2)
    module, _ = build_model("ssd300_ssd_custom", n_classes=20)
    encoder = TargetEncoder(
        spec=AnchorSpec(),
        predictor_sizes=ssd_predictor_sizes("resnet_custom"),
        n_classes=20,
    )
    trainer = Trainer(
        model=module,
        loss_fn=detection_loss_fn(),
        optimizer=optax.sgd(1e-3, momentum=0.9),
        mesh=mesh,
        tp_rule=tensor_parallel_rule,
        target_encoder=encoder.encode_fn,
        donate=False,
    )

    # Deterministic global batch of 4 (one per data shard); each process
    # contributes only its local rows — the deterministic per-host sharding
    # contract (`jax.make_array_from_process_local_data`).
    rng = np.random.default_rng(0)
    gy = rng.normal(0, 100, (4, 38, 38, 64)).astype(np.float32)
    gc = rng.normal(0, 30, (4, 19, 19, 128)).astype(np.float32)
    ggt = np.zeros((4, 8, 5), np.float32)
    ggt[:, 0] = [3, 30, 40, 160, 170]
    gmask = np.zeros((4, 8), bool)
    gmask[:, 0] = True
    pid = jax.process_index()
    lo, hi = 2 * pid, 2 * pid + 2

    with mesh:
        state = trainer.init_state(jax.random.PRNGKey(0), (gy[:1], gc[:1]))
        bs = trainer.batch_shardings(
            {"inputs": (0, 0), "gt": 0, "gt_mask": 0}
        )
        batch = {
            "inputs": (
                jax.make_array_from_process_local_data(
                    bs["inputs"][0], gy[lo:hi], (4, 38, 38, 64)
                ),
                jax.make_array_from_process_local_data(
                    bs["inputs"][1], gc[lo:hi], (4, 19, 19, 128)
                ),
            ),
            "gt": jax.make_array_from_process_local_data(
                bs["gt"], ggt[lo:hi], (4, 8, 5)
            ),
            "gt_mask": jax.make_array_from_process_local_data(
                bs["gt_mask"], gmask[lo:hi], (4, 8)
            ),
        }
        state, metrics = trainer.train_step(
            state, batch, jax.random.PRNGKey(1)
        )
        loss = float(metrics["total_loss"])
        assert np.isfinite(loss), loss

    print(f"MULTIPROC_OK {loss:.6f}")


if __name__ == "__main__":
    main()
