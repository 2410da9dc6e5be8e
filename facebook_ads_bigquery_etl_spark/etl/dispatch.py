"""Job dispatch — the reference's Pub/Sub entry point
(reference main.py:94-113,147-156): base64 message body selects the
pipeline, attributes carry config.

Fixes two latent reference bugs by construction:

* explicit backfill date: attributes['date'] is an ISO *string*; the
  reference calls ``.strftime`` on it and crashes (main.py:99-100).
  Here it's parsed with ``date.fromisoformat`` and tested.
* error-path logging: the reference calls ``.format`` on the return
  of ``logger.error`` (None) and crashes (main.py:129,143); here the
  error path raises a typed exception.
"""

from __future__ import annotations

import base64
import datetime as dt
from dataclasses import dataclass


@dataclass(frozen=True)
class JobRequest:
    job: str  # 'get_facebook' | 'get_currency'
    attributes: dict
    run_date: dt.date


def resolve_run_date(attributes: dict, today: dt.date | None = None) -> dt.date:
    """Yesterday by default (reference main.py:99-102), or the
    explicit ISO backfill date from attributes."""
    if "date" in attributes and attributes["date"]:
        return dt.date.fromisoformat(attributes["date"])
    today = today or dt.date.today()
    return today - dt.timedelta(days=1)


def dispatch_event(event: dict, today: dt.date | None = None) -> JobRequest:
    """Decode the pub/sub-style envelope into a routed job request
    (reference main.py:94-96 decode + main.py:104,147 routing)."""
    body = base64.b64decode(event["data"]).decode("utf-8")
    if body not in ("get_facebook", "get_currency"):
        raise ValueError(f"unknown job: {body!r}")
    attributes = event.get("attributes", {}) or {}
    return JobRequest(job=body, attributes=attributes, run_date=resolve_run_date(attributes, today))
