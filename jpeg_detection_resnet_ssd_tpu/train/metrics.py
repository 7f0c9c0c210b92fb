"""Metric sinks: TensorBoard + CSV fan-out.

The reference logs through Keras CSVLogger + a TensorBoard callback
(detection, `training_dct_pascal_j2d_resnet.py:297`) and declares comet.ml
tracking (`config/resnet/config_file.py:38-39`).  Here a single `MetricWriter`
fans out scalar rows to any combination of sinks; TensorBoard uses
`torch.utils.tensorboard` (CPU torch is available in this image) and degrades
to a no-op when absent.
"""

from __future__ import annotations

from jpeg_detection_resnet_ssd_tpu.train.checkpoints import CSVLogger


class TensorBoardSink:
    def __init__(self, logdir: str):
        from torch.utils.tensorboard import SummaryWriter

        self._writer = SummaryWriter(logdir)

    def log(self, row: dict, step: int):
        for k, v in row.items():
            try:
                self._writer.add_scalar(k, float(v), step)
            except (TypeError, ValueError):
                continue
        self._writer.flush()

    def close(self):
        self._writer.close()


class MetricWriter:
    """Fan-out scalar metrics to CSV and (optionally) TensorBoard."""

    def __init__(self, run_dir: str | None = None, csv_name: str = "results.csv",
                 tensorboard: bool = False):
        import os

        self._sinks = []
        self._csv = None
        if run_dir is not None:
            self._csv = CSVLogger(os.path.join(run_dir, "results", csv_name))
            if tensorboard:
                try:
                    self._sinks.append(
                        TensorBoardSink(os.path.join(run_dir, "tensorboard"))
                    )
                except ImportError:
                    pass

    def log(self, row: dict, step: int | None = None):
        if self._csv is not None:
            self._csv.log(row)
        s = int(step if step is not None else row.get("step", 0))
        for sink in self._sinks:
            sink.log(row, s)

    def close(self):
        for sink in self._sinks:
            sink.close()
