"""Train the algotrading example with a pickable model
(``/root/reference/examples/algotrading/__main__.py``)."""

import argparse
import sys
import tempfile

from rl8_tpu import TrainConfig
from rl8_tpu.conditions import Plateaus
from rl8_tpu.trainers.tracking import JsonlRun, set_default_run

from .env import AlgoTrading
from .models import AttentiveAlpaca, LazyLemur, MischievousMule

parser = argparse.ArgumentParser(
    description=(
        "An example algotrading environment where a policy learns to hold,"
        " buy, and sell an asset. A playground for custom sequence-based and"
        " recurrent models."
    )
)
parser.add_argument(
    "--model",
    choices=["lstm", "mlp", "transformer"],
    default="mlp",
    help="Model class type to use.",
)
parser.add_argument(
    "--fused-forward",
    action="store_true",
    help=(
        "Run the model through the fused Pallas chain kernels on TPU"
        " (every algotrading model declares a fused apply spec). Off by"
        " default: the on-device ablation (docs/performance.md) measured"
        " XLA autodiff FASTER for these models — the custom_vjp kernel"
        " boundary forces the assembly activations through HBM."
    ),
)
args = parser.parse_args()

match args.model:
    case "lstm":
        recurrent = True
        model_cls = LazyLemur
    case "mlp":
        recurrent = False
        model_cls = MischievousMule
    case "transformer":
        recurrent = False
        model_cls = AttentiveAlpaca

track_dir = tempfile.mkdtemp(prefix="rl8-tpu-algotrading-")
set_default_run(JsonlRun(track_dir))
print(f"Logging metrics under {track_dir}", file=sys.stderr)
train_config = TrainConfig(
    AlgoTrading,
    algorithm_config={
        "model_cls": model_cls,
        "fused_forward": args.fused_forward,
    },
    recurrent=recurrent,
)
trainer = train_config.build()
trainer.run(
    steps_per_eval=10,
    stop_conditions=[Plateaus("returns/mean", patience=10, rtol=0.05)],
)
