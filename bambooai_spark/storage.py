"""Interaction store (reference A20, bambooai/storage_manager.py:137-243).

Conversation state — chains of messages + results keyed (thread_id,
chain_id) — persisted as one JSON file per thread with atomic
write-tmp-then-rename (reference :80-108), restorable by (thread, chain).
Driver-side by design: this is control-plane state, not data.
"""

from __future__ import annotations

import json
import os
import tempfile


class InteractionStore:
    def __init__(self, base_dir: str):
        self.base_dir = base_dir
        os.makedirs(base_dir, exist_ok=True)

    def _path(self, thread_id: str) -> str:
        return os.path.join(self.base_dir, f"thread_{thread_id}.json")

    def _atomic_write(self, path: str, payload: dict) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.base_dir, suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as fh:
                json.dump(payload, fh, indent=2, default=str)
            os.replace(tmp, path)  # atomic on POSIX
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    def save_chain(self, thread_id: str, chain_id: str, record: dict) -> None:
        path = self._path(thread_id)
        data = self.load_thread(thread_id)
        data["chains"][str(chain_id)] = record
        self._atomic_write(path, {"thread_id": thread_id, "chains": data["chains"]})

    def load_thread(self, thread_id: str) -> dict:
        path = self._path(thread_id)
        if not os.path.exists(path):
            return {"thread_id": thread_id, "chains": {}}
        with open(path) as fh:
            return json.load(fh)

    def load_chain(self, thread_id: str, chain_id: str) -> dict | None:
        return self.load_thread(thread_id)["chains"].get(str(chain_id))

    def delete_chain(self, thread_id: str, chain_id: str) -> bool:
        """Remove one chain (reference storage_manager delete flow); the
        thread file disappears with its last chain. Returns whether the
        chain existed."""
        data = self.load_thread(thread_id)
        if str(chain_id) not in data["chains"]:
            return False
        del data["chains"][str(chain_id)]
        path = self._path(thread_id)
        if data["chains"]:
            self._atomic_write(
                path, {"thread_id": thread_id, "chains": data["chains"]}
            )
        elif os.path.exists(path):
            os.unlink(path)
        return True

    def threads(self) -> list[str]:
        return sorted(
            f[len("thread_") : -len(".json")]
            for f in os.listdir(self.base_dir)
            if f.startswith("thread_") and f.endswith(".json")
        )
