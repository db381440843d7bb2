"""Micro-benchmark the PPO minibatch gradient step in isolation.

The tracked algotrading (MischievousMule) iteration is update-dominated
(~0.89 ms per 32k-row minibatch fwd+bwd against an ~18 us MXU-peak FLOP
floor), so the cost is layout/HBM-bound. This tool times JUST the
gradient step at the real minibatch shape under controlled layout
variants, so hypotheses about TPU tile padding ([N, 1] tensors pad
1 -> 128 lanes; [N, 4, 1] windows pad to [8, 128] tiles — see
docs/performance.md § layout fixes) can be measured without the
5-25 min full-program compile of the training step.

K gradient steps run inside ONE jitted fori_loop with a real (tiny-lr)
SGD update threading the params between iterations — a serial
dependency XLA cannot CSE away — so the tunneled dispatch latency
(~27 ms RTT) amortizes to nothing.

Examples:
    python -m benchmarks.microbench_update --variant mule
    python -m benchmarks.microbench_update --variant mule-squeezed
    python -m benchmarks.microbench_update --variant mule-noln --rows 32768
"""

from __future__ import annotations

import argparse
import time


def _obs(key, N: int, L: int = 4, squeezed: bool = False):
    import jax
    import jax.numpy as jnp

    from rl8_tpu.data import DataKeys

    k1, k2 = jax.random.split(key)
    window = jax.random.normal(k1, (N, L) if squeezed else (N, L, 1))
    return {
        "action_mask": jnp.ones((N, 3), bool),
        "invested": jnp.zeros((N,) if squeezed else (N, 1), jnp.int32),
        "LOG_CHANGE(price)": {DataKeys.INPUTS: window},
        "LOG_CHANGE(price, position)": jax.random.normal(
            k2, (N,) if squeezed else (N, 1)
        ),
    }


def _mb(key, N: int, squeezed: bool = False):
    import jax
    import jax.numpy as jnp

    from rl8_tpu.data import DataKeys

    ka, kl, kd, kr, ko = jax.random.split(key, 5)
    shp = (N,) if squeezed else (N, 1)
    return {
        DataKeys.ACTIONS: jax.random.randint(
            ka, shp, 0, 3
        ),
        DataKeys.LOGP: -jnp.abs(jax.random.normal(kl, shp)),
        DataKeys.ADVANTAGES: jax.random.normal(kd, shp),
        DataKeys.RETURNS: jax.random.normal(kr, shp),
        DataKeys.VIEWS: {DataKeys.OBS: _obs(ko, N, squeezed=squeezed)},
    }


def _mule_loss(model, dist_cls):
    """The real autodiff path: flax apply + Categorical + ppo_losses,
    exactly as ``algorithms/_feedforward.py:_loss_fn``."""
    import jax
    import jax.numpy as jnp

    from rl8_tpu.data import DataKeys
    from rl8_tpu.nn.functional import ppo_losses

    def loss(params, mb):
        features, values = model.apply(
            {"params": params}, mb[DataKeys.VIEWS]
        )
        dist = dist_cls(features, model)
        losses = ppo_losses(
            mb, values, dist,
            clip_param=0.2, dual_clip_param=5.0, entropy_coeff=0.0,
            vf_clip_param=1.0, vf_coeff=1.0,
        )
        logp_ratio = dist.logp(mb[DataKeys.ACTIONS]) - mb[DataKeys.LOGP]
        kl = jnp.mean((jnp.exp(logp_ratio) - 1) - logp_ratio)
        return losses["total"], jax.lax.stop_gradient(kl)

    return loss


def _mule_squeezed_loss(model):
    """Real model (spec-shaped ``[N, 1]`` obs / ``[N, 1, 3]`` logits) but
    the LOSS side computes on flattened ``[N]`` arrays — the part the
    framework controls without touching the model/spec contract."""
    import jax
    import jax.numpy as jnp

    from rl8_tpu.data import DataKeys

    def loss(params, mb):
        features, values = model.apply(
            {"params": params}, mb[DataKeys.VIEWS]
        )
        logits = features["logits"].reshape(-1, 3)
        logz = jax.nn.log_softmax(logits, axis=-1)
        actions = mb[DataKeys.ACTIONS].reshape(-1)
        logp = jnp.take_along_axis(logz, actions[:, None], axis=-1)[:, 0]
        old_logp = mb[DataKeys.LOGP].reshape(-1)
        ratio = jnp.exp(logp - old_logp)
        adv = mb[DataKeys.ADVANTAGES].reshape(-1)
        surr1 = adv * ratio
        surr2 = adv * jnp.clip(ratio, 0.8, 1.2)
        clip1 = jnp.minimum(surr1, surr2)
        clip2 = jnp.maximum(clip1, 5.0 * adv)
        policy = jnp.mean(jnp.where(adv < 0, clip2, clip1))
        d = values.reshape(-1) - mb[DataKeys.RETURNS].reshape(-1)
        ad = jnp.abs(d)
        sl1 = jnp.where(ad < 1.0, 0.5 * d * d, ad - 0.5)
        vf = jnp.mean(jnp.clip(sl1, 0.0, 1.0))
        lr_ = logp - old_logp
        kl = jnp.mean((jnp.exp(lr_) - 1) - lr_)
        return vf - policy, jax.lax.stop_gradient(kl)

    return loss


def _squeezed_loss(hiddens=(128, 128), layer_norm=True, dtype=None):
    """Mule's math with every trailing-1 dim dropped: [N] rows, [N, L]
    windows, [N, 3] logits, inline log-softmax logp. Parameter layout
    matches the flax model (same dense shapes), so the FLOPs and HBM
    *logical* bytes are identical to the ``mule`` variant — any timing
    difference is tile-padding layout."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from rl8_tpu.data import DataKeys
    from rl8_tpu.nn import MLP, OneHotEmbed

    class SqueezedMule(nn.Module):
        dtype_: object = dtype

        @nn.compact
        def __call__(self, batch):
            obs = batch[DataKeys.OBS]
            x_inv = OneHotEmbed(2, 2, name="invested_embedding")(
                obs["invested"].reshape(-1)
            )
            w = obs["LOG_CHANGE(price)"][DataKeys.INPUTS]
            w = w.reshape(w.shape[0], -1)
            L = w.shape[1]
            feats = jnp.stack(
                [
                    jnp.sum(w[:, : L // 4], axis=1),
                    jnp.sum(w[:, : L // 2], axis=1),
                    jnp.sum(w[:, -(L // 2):], axis=1),
                    jnp.sum(w[:, -(L // 4):], axis=1),
                ],
                axis=-1,
            )
            x = jnp.concatenate(
                [
                    x_inv,
                    obs["LOG_CHANGE(price, position)"].reshape(-1, 1),
                    feats,
                ],
                axis=-1,
            )
            if self.dtype_ is not None:
                x = x.astype(self.dtype_)
            latents = nn.relu(
                MLP(hiddens, activation_fn="relu", layer_norm=layer_norm,
                    dtype=self.dtype_, name="feature_model")(x)
            )
            logits = nn.Dense(3, dtype=self.dtype_, name="feature_head")(
                latents
            ).astype(jnp.float32)
            vf_latents = nn.relu(
                MLP(hiddens, activation_fn="relu", layer_norm=layer_norm,
                    dtype=self.dtype_, name="vf_model")(x)
            )
            values = nn.Dense(1, dtype=self.dtype_, name="vf_head")(
                vf_latents
            ).astype(jnp.float32)
            mask = batch[DataKeys.OBS]["action_mask"]
            logits = jnp.where(mask, logits, -1e8)
            return logits, values.reshape(-1)

    model = SqueezedMule()

    def loss(params, mb):
        logits, values = model.apply({"params": params}, mb[DataKeys.VIEWS])
        logz = jax.nn.log_softmax(logits, axis=-1)
        logp = jnp.take_along_axis(
            logz, mb[DataKeys.ACTIONS][:, None], axis=-1
        )[:, 0]
        ratio = jnp.exp(logp - mb[DataKeys.LOGP])
        adv = mb[DataKeys.ADVANTAGES]
        surr1 = adv * ratio
        surr2 = adv * jnp.clip(ratio, 0.8, 1.2)
        clip1 = jnp.minimum(surr1, surr2)
        clip2 = jnp.maximum(clip1, 5.0 * adv)
        policy = jnp.mean(jnp.where(adv < 0, clip2, clip1))
        d = values - mb[DataKeys.RETURNS]
        ad = jnp.abs(d)
        sl1 = jnp.where(ad < 1.0, 0.5 * d * d, ad - 0.5)
        vf = jnp.mean(jnp.clip(sl1, 0.0, 1.0))
        lr_ = logp - mb[DataKeys.LOGP]
        kl = jnp.mean((jnp.exp(lr_) - 1) - lr_)
        return vf - policy, jax.lax.stop_gradient(kl)

    return model, loss


def run(variant: str, rows: int, k: int, repeats: int) -> dict:
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)

    if "squeezed" in variant:
        model, loss = _squeezed_loss(
            layer_norm="noln" not in variant, dtype=jnp.bfloat16
        )
        mb = _mb(key, rows, squeezed=True)
    else:
        from examples.algotrading.env import AlgoTrading
        from examples.algotrading.models import MischievousMule
        from rl8_tpu.distributions import Categorical

        env = AlgoTrading(1)
        model = MischievousMule(
            env.observation_spec, env.action_spec, dtype=jnp.bfloat16
        )
        mb = _mb(key, rows, squeezed=False)
        if variant == "mule-loss-flat":
            loss = _mule_squeezed_loss(model)
        else:
            loss = _mule_loss(model, Categorical)

    from rl8_tpu.data import DataKeys

    params = model.init(jax.random.PRNGKey(1), mb[DataKeys.VIEWS])["params"]
    grad_fn = jax.grad(lambda p, m: loss(p, m)[0])

    @jax.jit
    def k_steps(p, m):
        def body(_, p):
            g = grad_fn(p, m)
            return jax.tree_util.tree_map(
                lambda a, b: a - 1e-8 * b.astype(a.dtype), p, g
            )
        p = jax.lax.fori_loop(0, k, body, p)
        return jax.tree_util.tree_reduce(
            lambda acc, x: acc + jnp.sum(x.astype(jnp.float32)), p, 0.0
        )

    # Time via a host-float fetch of the scalar result: on the tunneled
    # bench TPU, block_until_ready does not reliably block, while a
    # host conversion must wait for the value (same pattern bench.py
    # uses for honest end-to-end timing).
    float(k_steps(params, mb))  # compile
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(k_steps(params, mb))
        best = min(best, time.perf_counter() - t0)
    ms = best / k * 1e3
    return {
        "variant": variant,
        "rows": rows,
        "ms_per_minibatch_grad": ms,
        "k": k,
    }


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--variant",
        default="mule",
        choices=(
            "mule",            # the real model + real loss path
            "mule-loss-flat",  # real model, loss math on flattened [N]
            "mule-squeezed",   # same math, trailing-1 dims dropped
            "mule-noln-squeezed",  # squeezed and without LayerNorm
        ),
    )
    parser.add_argument("--rows", type=int, default=32768)
    parser.add_argument("--k", type=int, default=50)
    parser.add_argument("--repeats", type=int, default=3)
    args = parser.parse_args()
    import json

    print(json.dumps(run(args.variant, args.rows, args.k, args.repeats)))


if __name__ == "__main__":
    main()
