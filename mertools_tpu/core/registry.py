"""Global name→class registry.

Plays the role of ``my_affectgpt/common/registry.py`` in the reference (used
throughout the MLLM stack via decorators like
``@registry.register_model("affectgpt")``) but is framework-wide here: fusion
models, encoders, datasets, processors, tasks, and lr schedules all register
into namespaced tables so CLIs resolve everything by name.
"""

from __future__ import annotations

from typing import Any, Callable


class Registry:
    def __init__(self):
        self._tables: dict[str, dict[str, Any]] = {}

    def _table(self, kind: str) -> dict[str, Any]:
        return self._tables.setdefault(kind, {})

    def register(self, kind: str, name: str) -> Callable:
        def deco(obj):
            table = self._table(kind)
            if name in table and table[name] is not obj:
                raise KeyError(f"{kind}:{name} already registered to {table[name]}")
            table[name] = obj
            return obj

        return deco

    def get(self, kind: str, name: str) -> Any:
        table = self._table(kind)
        if name not in table:
            known = ", ".join(sorted(table)) or "<none>"
            raise KeyError(f"unknown {kind} {name!r}; known: {known}")
        return table[name]

    def names(self, kind: str) -> list[str]:
        return sorted(self._table(kind))

    # -- convenience namespaced decorators --
    def register_model(self, name):
        return self.register("model", name)

    def register_encoder(self, name):
        return self.register("encoder", name)

    def register_dataset(self, name):
        return self.register("dataset", name)

    def register_processor(self, name):
        return self.register("processor", name)

    def register_task(self, name):
        return self.register("task", name)

    def register_lr_schedule(self, name):
        return self.register("lr_schedule", name)

    def get_model(self, name):
        return self.get("model", name)

    def get_encoder(self, name):
        return self.get("encoder", name)

    def get_dataset(self, name):
        return self.get("dataset", name)

    def get_processor(self, name):
        return self.get("processor", name)

    def get_task(self, name):
        return self.get("task", name)

    def get_lr_schedule(self, name):
        return self.get("lr_schedule", name)


registry = Registry()
