"""Minimal ``mlflow.pyfunc`` stand-in: enough of the save/load protocol
for the reference's pyfunc round-trip (cloudpickle the python_model,
copy artifacts, call ``load_context`` on load)."""

from __future__ import annotations

import json
import os
import shutil
from typing import Any


class PythonModel:
    pass


class PythonModelContext:
    def __init__(self, artifacts: dict[str, str] | None = None) -> None:
        self.artifacts = artifacts or {}


def save_model(
    path: str,
    *,
    python_model: Any = None,
    artifacts: dict[str, str] | None = None,
    **_: Any,
) -> None:
    import cloudpickle

    os.makedirs(path, exist_ok=True)
    stored: dict[str, str] = {}
    for key, src in (artifacts or {}).items():
        dst = os.path.join(path, f"{key}_{os.path.basename(src)}")
        shutil.copy(src, dst)
        stored[key] = dst
    with open(os.path.join(path, "python_model.pkl"), "wb") as f:
        cloudpickle.dump(python_model, f)
    with open(os.path.join(path, "artifacts.json"), "w") as f:
        json.dump(stored, f)


class _LoadedModel:
    def __init__(self, python_model: Any, context: PythonModelContext) -> None:
        self._model = python_model
        self._context = context

    def predict(self, data: Any, params: Any = None) -> Any:
        # Mirror mlflow 2.x's dispatch: python models whose ``predict``
        # signature accepts ``params`` get it passed positionally as
        # ``(context, model_input, params)``; legacy two-arg models get
        # ``(context, model_input)``.
        import inspect

        sig = inspect.signature(self._model.predict)
        if "params" in sig.parameters:
            return self._model.predict(self._context, data, params)
        return self._model.predict(self._context, data)


def load_model(path: str, **_: Any) -> _LoadedModel:
    import cloudpickle

    with open(os.path.join(path, "python_model.pkl"), "rb") as f:
        model = cloudpickle.load(f)
    with open(os.path.join(path, "artifacts.json")) as f:
        context = PythonModelContext(json.load(f))
    model.load_context(context)
    return _LoadedModel(model, context)
