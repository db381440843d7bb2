"""Train MountainCar
(``/root/reference/examples/mountain_car/__main__.py``)."""

import sys
import tempfile

from rl8_tpu import AlgorithmConfig, Trainer
from rl8_tpu.conditions import HitsUpperBound
from rl8_tpu.trainers.tracking import JsonlRun, set_default_run

from .env import MountainCar

track_dir = tempfile.mkdtemp(prefix="rl8-tpu-mountain-car-")
set_default_run(JsonlRun(track_dir))
print(f"Logging metrics under {track_dir}", file=sys.stderr)
algo = AlgorithmConfig(horizon=64).build(MountainCar)
trainer = Trainer(algo)
trainer.run(
    steps_per_eval=5,
    stop_conditions=[HitsUpperBound("algorithm/steps", 40)],
)
