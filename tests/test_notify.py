"""K8 webhook notification sink (jobs/notify.py) — offline, fake poster.

Reference semantics: POST ``{"content": msg}`` on success and task failure,
never raise (``/root/reference/dags/monthly_price_paid_data.py:34-48``)."""

from __future__ import annotations

import pytest

from airflow_dags_spark.jobs import notify as N


@pytest.fixture()
def capture(monkeypatch):
    sent: list[tuple[str, dict]] = []
    monkeypatch.setenv(N.ENV_VAR, "https://example.invalid/webhook")
    return sent, lambda url, payload: sent.append((url, payload))


def test_notify_posts_content_payload(capture):
    sent, poster = capture
    assert N.notify("hello", poster=poster) is True
    assert sent == [("https://example.invalid/webhook", {"content": "hello"})]


def test_notify_explicit_url_overrides_env(capture):
    sent, poster = capture
    assert N.notify("m", webhook_url="https://other.invalid/x", poster=poster)
    assert sent[0][0] == "https://other.invalid/x"


def test_notify_without_url_skips_and_returns_false(monkeypatch):
    monkeypatch.delenv(N.ENV_VAR, raising=False)
    called = []
    assert N.notify("m", poster=lambda u, p: called.append(u)) is False
    assert called == []


def test_notify_swallows_poster_errors(capture):
    _, _ = capture

    def bad_poster(url, payload):
        raise OSError("connection refused")

    # must not raise — notification is best-effort
    assert N.notify("m", poster=bad_poster) is False


def test_notify_logs_warning_on_delivery_failure(capture, caplog):
    """Never-raise is the contract, but the failure must be DISCOVERABLE:
    a dead webhook emits a WARNING (with the traceback) so an operator can
    find the outage in scheduler logs instead of a silently quiet channel."""
    _, _ = capture

    def bad_poster(url, payload):
        raise OSError("connection refused")

    with caplog.at_level("WARNING", logger=N.log.name):
        assert N.notify("monthly load done", poster=bad_poster) is False
    warn = [r for r in caplog.records if r.levelname == "WARNING"]
    assert warn, "delivery failure must log a warning"
    assert "monthly load done" in warn[0].getMessage()
    assert warn[0].exc_info is not None  # traceback attached for diagnosis


def test_success_and_failure_message_shapes(capture):
    sent, poster = capture
    N.notify_success("Oxford Price Paid Data (Monthly Update)", poster=poster)
    N.notify_failure("dag_x", "task_y", poster=poster)
    assert sent[0][1]["content"] == (
        "✅ Oxford Price Paid Data (Monthly Update) loaded successfully!"
    )
    assert sent[1][1]["content"] == "❌ DAG `dag_x` task `task_y` failed!"


def test_on_failure_callback_reads_airflow_context(capture, monkeypatch):
    sent = []
    monkeypatch.setattr(N, "post_json", lambda url, payload: sent.append(payload))

    class _Task:
        task_id = "spark_monthly_update"

    class _Dag:
        dag_id = "monthly_price_paid_data_spark"

    N.on_failure_callback({"task_instance": _Task(), "dag": _Dag()})
    assert sent == [
        {
            "content": "❌ DAG `monthly_price_paid_data_spark` task "
            "`spark_monthly_update` failed!"
        }
    ]


def test_post_json_builds_a_json_post_request(monkeypatch):
    seen = {}

    class _Resp:
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def fake_urlopen(req, timeout=None):
        seen["url"] = req.full_url
        seen["method"] = req.get_method()
        seen["body"] = req.data
        seen["ct"] = req.get_header("Content-type")
        return _Resp()

    monkeypatch.setattr(N.urllib.request, "urlopen", fake_urlopen)
    N.post_json("https://example.invalid/hook", {"content": "x"})
    assert seen["method"] == "POST"
    assert seen["ct"] == "application/json"
    assert b'"content": "x"' in seen["body"]
