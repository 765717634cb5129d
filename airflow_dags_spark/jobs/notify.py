"""Webhook notification sink (SURVEY.md §2 K8).

The reference posts a JSON ``{"content": message}`` to a Discord-style
webhook on pipeline success and task failure
(``/root/reference/dags/monthly_price_paid_data.py:34-39,174-175``; every
DAG wires ``on_failure_callback``). This module reproduces that contract
with:

- stdlib-only HTTP (``urllib.request`` — no ``requests`` dependency in the
  engine container);
- an injectable ``poster`` so orchestration tests run offline;
- the same never-raise discipline: a notification failure must never fail
  the pipeline (the reference swallows and prints, so do we);
- the webhook URL from the ``ENGINE_WEBHOOK_URL`` env var (a real
  deployment uses the scheduler's secret store) — unset ⇒ notifications
  degrade to stdout, which keeps local runs and CI quiet-but-observable.
"""

from __future__ import annotations

import json
import logging
import os
import urllib.request
from collections.abc import Callable

log = logging.getLogger(__name__)

ENV_VAR = "ENGINE_WEBHOOK_URL"

Poster = Callable[[str, dict], None]


def post_json(url: str, payload: dict, timeout: float = 10.0) -> None:
    """POST ``payload`` as JSON. The default poster; raises on HTTP errors
    (callers decide whether to swallow — ``notify`` does)."""
    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode("utf-8"),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout):  # noqa: S310 (url from config)
        pass


def notify(
    message: str,
    *,
    webhook_url: str | None = None,
    poster: Poster | None = None,
) -> bool:
    """Send ``{"content": message}`` to the webhook. Returns True if a POST
    was attempted and did not raise; False when skipped (no URL) or failed.
    NEVER raises — notification is best-effort by contract."""
    url = webhook_url if webhook_url is not None else os.environ.get(ENV_VAR)
    if not url:
        log.info("[notify] (no %s set) %s", ENV_VAR, message)
        return False
    try:
        (poster or post_json)(url, {"content": message})
        return True
    except Exception:  # noqa: BLE001 — best-effort sink
        # never-raise is the contract (a dead webhook must not fail the
        # pipeline), but log-and-continue so the dead webhook is
        # DISCOVERABLE in scheduler logs — a silent swallow hides an
        # outage until someone notices the channel went quiet
        log.warning(
            "[notify] failed to deliver webhook notification: %s", message,
            exc_info=True,
        )
        return False


def notify_success(pipeline: str, **kwargs) -> bool:
    """Success-path message, reference wording shape ('✅ … loaded
    successfully!')."""
    return notify(f"✅ {pipeline} loaded successfully!", **kwargs)


def notify_failure(dag_id: str, task_id: str, **kwargs) -> bool:
    """Failure-path message, reference wording shape
    ('❌ DAG `x` task `y` failed!')."""
    return notify(f"❌ DAG `{dag_id}` task `{task_id}` failed!", **kwargs)


def on_failure_callback(context: dict) -> None:
    """Airflow ``on_failure_callback``-compatible adapter: pulls dag/task ids
    from the task context exactly like the reference's ``on_failure``."""
    task = context.get("task_instance")
    dag = context.get("dag")
    notify_failure(
        getattr(dag, "dag_id", "<unknown-dag>"),
        getattr(task, "task_id", "<unknown-task>"),
    )


__all__ = [
    "ENV_VAR",
    "post_json",
    "notify",
    "notify_success",
    "notify_failure",
    "on_failure_callback",
]
