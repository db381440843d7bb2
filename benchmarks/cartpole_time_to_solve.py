"""CartPole time-to-solve: wall-clock (post-compile) until the shaped
return reaches near-optimal, mirroring the reference's "solved within
seconds" claim (``/root/reference/README.md:16-20``; its reward shaping
makes 0 the maximum per-step reward, so returns/mean -> 0 when solved).

Example:
    python -m benchmarks.cartpole_time_to_solve
"""

from __future__ import annotations

import json
import time


def main() -> None:
    from examples.cartpole.env import CartPole
    from rl8_tpu import AlgorithmConfig

    algo = AlgorithmConfig(horizon=64).build(CartPole)
    threshold = -16.0  # ~-0.25 shaped cost per step over 64 steps
    t_compile = time.perf_counter()
    algo.train_steps(1)  # compile + first step
    compile_s = time.perf_counter() - t_compile

    start = time.perf_counter()
    solved_at = None
    for step in range(2, 101):
        stats = algo.train_steps(1)[0]
        if stats["returns/mean"] > threshold:
            solved_at = (step, time.perf_counter() - start)
            break
    print(
        json.dumps(
            {
                "compile_and_first_step_s": compile_s,
                "solved": solved_at is not None,
                "steps_to_solve": solved_at[0] if solved_at else None,
                "seconds_to_solve_post_compile": solved_at[1] if solved_at else None,
                "final_returns_mean": stats["returns/mean"],
            }
        )
    )


if __name__ == "__main__":
    main()
