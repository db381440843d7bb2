"""Train Pendulum (``/root/reference/examples/pendulum/__main__.py``)."""

import sys
import tempfile

from rl8_tpu import AlgorithmConfig, Trainer
from rl8_tpu.conditions import HitsUpperBound
from rl8_tpu.trainers.tracking import JsonlRun, set_default_run

from .env import Pendulum

track_dir = tempfile.mkdtemp(prefix="rl8-tpu-pendulum-")
set_default_run(JsonlRun(track_dir))
print(f"Logging metrics under {track_dir}", file=sys.stderr)
algo = AlgorithmConfig(
    horizon=128,
    horizons_per_env_reset=4,
).build(Pendulum)
trainer = Trainer(algo)
trainer.run(
    steps_per_eval=4,
    stop_conditions=[HitsUpperBound("algorithm/steps", 100)],
)
