"""No-op ``mlflow`` stand-in: lets the reference import and log without
an MLflow install. Metrics land in ``mlflow.LOGGED_METRICS`` for the
curve recorder."""

from __future__ import annotations

from typing import Any

from . import pyfunc  # noqa: F401  (mlflow.pyfunc attribute access)

LOGGED_METRICS: list[tuple[dict[str, float], int | None]] = []
LOGGED_PARAMS: list[dict[str, Any]] = []


def log_metrics(metrics: dict[str, float], step: int | None = None, **_: Any) -> None:
    LOGGED_METRICS.append((dict(metrics), step))


def log_metric(key: str, value: float, step: int | None = None, **_: Any) -> None:
    LOGGED_METRICS.append(({key: value}, step))


def log_params(params: dict[str, Any], **_: Any) -> None:
    LOGGED_PARAMS.append(dict(params))


def log_param(key: str, value: Any, **_: Any) -> None:
    LOGGED_PARAMS.append({key: value})


def set_experiment(*args: Any, **kwargs: Any) -> None:
    pass


class _Run:
    class info:
        run_id = "shim"

    def __enter__(self) -> "_Run":
        return self

    def __exit__(self, *exc: Any) -> None:
        pass


def start_run(*args: Any, **kwargs: Any) -> _Run:
    return _Run()


def end_run(*args: Any, **kwargs: Any) -> None:
    pass


def delete_run(*args: Any, **kwargs: Any) -> None:
    pass


def active_run() -> _Run:
    return _Run()
