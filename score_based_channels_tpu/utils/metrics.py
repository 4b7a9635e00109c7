"""Structured metrics logging (SURVEY.md §5 — the reference only has
print + in-memory lists saved at the end; here every trainer/harness can
emit machine-readable JSONL alongside its console output)."""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


class MetricsLogger:
    """Append-only JSONL metrics sink with wall-clock stamps."""

    def __init__(self, path: Optional[str] = None):
        self.path = path
        self._t0 = time.time()
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            # truncate previous run
            with open(path, "w"):
                pass

    def log(self, event: str, **fields: Any) -> None:
        if not self.path:
            return
        rec: Dict[str, Any] = {"event": event,
                               "t": round(time.time() - self._t0, 3)}
        rec.update({k: (float(v) if hasattr(v, "item") else v)
                    for k, v in fields.items()})
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
