"""Train CartPole (``/root/reference/examples/cartpole/__main__.py``)."""

import sys
import tempfile

from rl8_tpu import AlgorithmConfig, Trainer
from rl8_tpu.conditions import HitsUpperBound
from rl8_tpu.trainers.tracking import JsonlRun, set_default_run

from .env import CartPole

track_dir = tempfile.mkdtemp(prefix="rl8-tpu-cartpole-")
set_default_run(JsonlRun(track_dir))
print(f"Logging metrics under {track_dir}", file=sys.stderr)
algo = AlgorithmConfig(horizon=64).build(CartPole)
trainer = Trainer(algo)
trainer.run(
    steps_per_eval=5,
    stop_conditions=[HitsUpperBound("algorithm/steps", 40)],
)
