"""A14 — Schema-registry shim.

The reference talks to Confluent Schema Registry over REST: fetch latest
schema+id by subject (proto/producer/main.go:29-31), get-or-create
(pure_go_client/main_sarama.go:62-71 `assertSchema`), subject naming
`<topic>-value` (commands.sh:28-31).

Engine-side the registry is a driver-resident dict persisted to JSON; the
id→schema map is tiny and is closed over by the plan (broadcast with the task
binary), so executors never call back. A production deployment would back this
with the real REST registry — the surface is identical.
"""

from __future__ import annotations

import json
import os
import threading


def value_subject(topic: str) -> str:
    """Subject naming convention: <topic>-value (commands.sh:28-31)."""
    return f"{topic}-value"


class SchemaRegistry:
    """get_or_create / by_id / latest — the three verbs the reference uses."""

    def __init__(self, path: str | None = None):
        self._path = path
        self._lock = threading.Lock()
        self._by_subject: dict[str, list[int]] = {}
        self._by_id: dict[int, str] = {}
        self._next_id = 1
        if path and os.path.exists(path):
            with open(path) as f:
                data = json.load(f)
            self._by_subject = data["by_subject"]
            self._by_id = {int(k): v for k, v in data["by_id"].items()}
            self._next_id = data["next_id"]

    def get_or_create(self, subject: str, schema: str) -> int:
        """assertSchema semantics (main_sarama.go:62-71): return the existing
        id when this exact schema is already registered, else register a new
        version under the subject."""
        canon = json.dumps(json.loads(schema), sort_keys=True) \
            if schema.lstrip().startswith("{") else schema
        with self._lock:
            for sid in self._by_subject.get(subject, []):
                if self._by_id[sid] == canon:
                    return sid
            sid = self._next_id
            self._next_id += 1
            self._by_id[sid] = canon
            self._by_subject.setdefault(subject, []).append(sid)
            self._save()
            return sid

    def by_id(self, schema_id: int) -> str:
        return self._by_id[schema_id]

    def latest(self, subject: str) -> tuple[int, str]:
        """Fetch latest (id, schema) for a subject (proto/producer/main.go:29-31)."""
        versions = self._by_subject[subject]
        sid = versions[-1]
        return sid, self._by_id[sid]

    def subjects(self) -> list[str]:
        return sorted(self._by_subject)

    def _save(self) -> None:
        if not self._path:
            return
        with open(self._path, "w") as f:
            json.dump({"by_subject": self._by_subject,
                       "by_id": self._by_id,
                       "next_id": self._next_id}, f)
