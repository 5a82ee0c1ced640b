"""S15 relay fan-out: message templates, addressed-command protocol,
ERROR-only mail escalation, and the listener → logging → relay path —
reference semantics per encodesrv/logs/ (messages.py, __init__.py,
log.py, bots/common.py, bots/irc_.py, bots/slack.py)."""

from __future__ import annotations

import logging

import pytest

from encodesrv_spark.streaming import relays
from encodesrv_spark.streaming.relays import (
    Message,
    RelayHub,
    RelayLogger,
    SmtpRelay,
    dispatch_command,
    form_status_message,
    format_message,
    parse_addressed,
    setup_relays,
)


class Recorder:
    """Transport double: records (target, message) pairs."""

    def __init__(self) -> None:
        self.sent: list[tuple[str, str]] = []

    def __call__(self, target: str, message: str) -> None:
        self.sent.append((target, message))


class MailRecorder:
    def __init__(self) -> None:
        self.sent: list[tuple[str, tuple[str, ...], str, str]] = []

    def __call__(self, fromaddr, toaddrs, subject, body) -> None:
        self.sent.append((fromaddr, toaddrs, subject, body))


def _status() -> str:
    return form_status_message(["a.mov", "b.mov"], 2)


def _irc(rec: Recorder, **kw) -> relays.IrcRelay:
    kw.setdefault("nick", "encbot")
    kw.setdefault("channel", "#encode")
    kw.setdefault("status_provider", _status)
    return relays.IrcRelay(rec, **kw)


# ---------------------------------------------------------------------------
# messages (reference logs/messages.py:12-18 verbatim)
# ---------------------------------------------------------------------------


def test_message_templates_verbatim():
    assert (
        format_message(Message.start_job, {"id_": 7, "name": "x.mov"})
        == "Starting job 7: x.mov."
    )
    assert (
        format_message(Message.finish_job, {"id_": 7, "name": "x.mov"})
        == "Finished job 7: x.mov."
    )
    assert format_message(Message.start_server) == "Starting up Encodesrv."
    assert format_message(Message.unknown_cmd) == "I don't know what you're asking."
    assert format_message("plain text") == "plain text"


@pytest.mark.parametrize(
    ("jobs", "waiting", "expect"),
    [
        (["a.mov"], 1, "Currently encoding a.mov, with 1 item waiting."),
        (["a.mov", "b.mov"], 2, "Currently encoding a.mov, b.mov, with 2 items waiting."),
        ([], 0, "Currently encoding no jobs, with 0 items waiting."),
    ],
)
def test_status_message_shapes(jobs, waiting, expect):
    # pluralization + 'no jobs' fallback (reference common.py:59-80)
    assert form_status_message(jobs, waiting) == expect


# ---------------------------------------------------------------------------
# addressed-message parse (reference common.py:11)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    ("text", "expect"),
    [
        ("<@encbot>: status", ("encbot", "status")),
        ("@encbot: status", ("encbot", "status")),
        ("encbot: status now", ("encbot", "status now")),
        ("encbot:status", ("encbot", "status")),
        ("no address here", None),
    ],
)
def test_parse_addressed(text, expect):
    assert parse_addressed(text) == expect


def test_dispatch_status_and_help():
    assert dispatch_command("status", _status) == _status()
    assert (
        dispatch_command("dance", _status) == "I don't know what you're asking."
    )


# ---------------------------------------------------------------------------
# IRC relay (reference irc_.py:67-119,153-163)
# ---------------------------------------------------------------------------


def test_irc_channel_command_reply_prefixed_with_asker():
    rec = Recorder()
    bot = _irc(rec)
    bot.handle_message("alice", "encbot: status")
    assert rec.sent == [("#encode", f"alice: {_status()}")]


def test_irc_nick_match_is_case_insensitive():
    rec = Recorder()
    bot = _irc(rec)
    bot.handle_message("alice", "EncBot: status")
    assert len(rec.sent) == 1


def test_irc_unaddressed_channel_message_ignored():
    rec = Recorder()
    bot = _irc(rec)
    bot.handle_message("alice", "just chatting about status")
    bot.handle_message("alice", "otherbot: status")
    assert rec.sent == []


def test_irc_private_command_replies_direct_to_asker():
    rec = Recorder()
    bot = _irc(rec)
    bot.handle_message("alice", "status", private=True)
    assert rec.sent == [("alice", _status())]


def test_irc_unknown_command_gets_help():
    rec = Recorder()
    bot = _irc(rec)
    bot.handle_message("alice", "encbot: dance")
    assert rec.sent == [("#encode", "alice: I don't know what you're asking.")]


def test_irc_log_records_relay_to_home_channel():
    rec = Recorder()
    bot = _irc(rec)
    log = logging.getLogger("test.relays.irc")
    log.setLevel(logging.INFO)
    log.addHandler(bot)
    try:
        log.info("Starting job 7: x.mov.")
    finally:
        log.removeHandler(bot)
    assert rec.sent == [("#encode", "Starting job 7: x.mov.")]


# ---------------------------------------------------------------------------
# Slack relay (reference slack.py:41-82,89-118)
# ---------------------------------------------------------------------------


def _slack(rec: Recorder) -> relays.SlackRelay:
    return relays.SlackRelay(
        rec,
        servername="enc1",
        username="encbot",
        channel="#media",
        status_provider=_status,
    )


def test_slack_outbound_carries_servername_prefix():
    rec = Recorder()
    _slack(rec).send_msg("hello")
    assert rec.sent == [("#media", "enc1> hello")]


def test_slack_answers_only_when_addressed_to_self():
    rec = Recorder()
    bot = _slack(rec)
    bot.handle_message("<@someoneelse>: status")
    bot.handle_message("free text")
    assert rec.sent == []
    bot.handle_message("<@encbot>: status")
    assert rec.sent == [("#media", f"enc1> {_status()}")]


# ---------------------------------------------------------------------------
# SMTP relay (reference log.py:32-38)
# ---------------------------------------------------------------------------


def test_smtp_fires_on_error_only_with_failure_subject():
    mail = MailRecorder()
    h = SmtpRelay(mail, fromaddr="enc@x", toaddrs=["ops@x"])
    log = logging.getLogger("test.relays.smtp")
    log.setLevel(logging.DEBUG)
    log.addHandler(h)
    try:
        log.info("routine")
        log.warning("also routine")
        log.error("encode blew up")
    finally:
        log.removeHandler(h)
    assert len(mail.sent) == 1
    fromaddr, toaddrs, subject, body = mail.sent[0]
    assert (fromaddr, toaddrs) == ("enc@x", ("ops@x",))
    assert subject == "Encode Job Failure"
    assert "encode blew up" in body


# ---------------------------------------------------------------------------
# RelayLogger fan-out (reference logs/__init__.py:18-70)
# ---------------------------------------------------------------------------


def _hub_with_bots() -> tuple[RelayHub, Recorder, Recorder]:
    hub = RelayHub()
    irc_rec, slack_rec = Recorder(), Recorder()
    hub.get_relay(
        "irc_", transport=irc_rec, nick="encbot", channel="#encode",
        status_provider=_status,
    )
    hub.get_relay(
        "slack", transport=slack_rec, servername="enc1", username="encbot",
        channel="#media", status_provider=_status,
    )
    return hub, irc_rec, slack_rec


def test_relay_logger_fans_info_to_all_bots():
    hub, irc_rec, slack_rec = _hub_with_bots()
    rl = RelayLogger("test.relays.app", hub)
    rl.info(Message.start_job, {"id_": 3, "name": "y.mov"})
    assert irc_rec.sent == [("#encode", "Starting job 3: y.mov.")]
    assert slack_rec.sent == [("#media", "enc1> Starting job 3: y.mov.")]


def test_relay_logger_debug_and_bot_false_do_not_fan():
    hub, irc_rec, slack_rec = _hub_with_bots()
    rl = RelayLogger("test.relays.app", hub)
    rl.debug("quiet")  # debug never reaches bots (logs/__init__.py:46-49)
    rl.error("suppressed", bot=False)
    assert irc_rec.sent == [] and slack_rec.sent == []
    rl.error("loud")
    assert len(irc_rec.sent) == len(slack_rec.sent) == 1


def test_get_relay_accepts_both_irc_spellings_and_rejects_unknown():
    hub = RelayHub()
    for kind in ("irc", "irc_"):
        hub.get_relay(
            kind, transport=Recorder(), nick="n", channel="#c",
            status_provider=_status,
        )
    assert len(hub.bots) == 2
    with pytest.raises(ValueError):
        hub.get_relay("msn", transport=Recorder())


# ---------------------------------------------------------------------------
# setup topology + listener path (reference log.py:14-48)
# ---------------------------------------------------------------------------


def test_setup_relays_topology_and_error_escalation():
    mail, irc_rec, slack_rec = MailRecorder(), Recorder(), Recorder()
    name = "test.relays.setup"
    log = logging.getLogger(name)
    log.setLevel(logging.INFO)
    before = list(log.handlers)
    hub = setup_relays(
        {
            "servername": "enc1",
            "mail": {"enabled": True, "from": "enc@x", "to": ["ops@x"]},
            "irc": {"enabled": True, "nick": "encbot", "channel": "#encode"},
            "slack": {"enabled": True, "username": "encbot", "channel": "#media"},
        },
        status_provider=_status,
        logger_name=name,
        smtp_sender=mail,
        irc_transport=irc_rec,
        slack_transport=slack_rec,
    )
    try:
        assert len(hub.bots) == 2
        # INFO reaches bots but not mail; ERROR reaches all three —
        # the listener's terminated-with-exception escalation path
        log.info("batch 3: 120 rows")
        assert mail.sent == []
        log.error("[terminated] q1 exception: boom")
        assert len(mail.sent) == 1 and mail.sent[0][2] == "Encode Job Failure"
        assert ("#encode", "batch 3: 120 rows") in irc_rec.sent
        assert ("#media", "enc1> [terminated] q1 exception: boom") in slack_rec.sent
    finally:
        log.handlers = before


def test_setup_relays_disabled_blocks_attach_nothing():
    name = "test.relays.disabled"
    log = logging.getLogger(name)
    before = list(log.handlers)
    hub = setup_relays(
        {"mail": {"enabled": False}, "irc": {}, "slack": {}},
        status_provider=_status,
        logger_name=name,
        smtp_sender=MailRecorder(),
        irc_transport=Recorder(),
        slack_transport=Recorder(),
    )
    assert hub.bots == [] and log.handlers == before


def test_listener_events_flow_to_relays():
    """End-to-end: StreamingQueryListener events → python logging →
    attached relays (the engine-telemetry path)."""
    from encodesrv_spark.streaming import listener as listener_mod

    irc_rec = Recorder()
    bot = _irc(irc_rec)
    log = logging.getLogger("encodesrv_spark.streaming")
    old_level = log.level
    log.setLevel(logging.INFO)
    log.addHandler(bot)
    lst = listener_mod.LogRelayListener()
    try:
        # drive the listener directly (no real stream needed: the
        # callbacks are plain methods receiving event objects)
        lst._emit("started", "qid-1", "hourly", None, None, "query started")
        lst._emit(
            "terminated", "qid-1", None, None, None,
            "exception: boom", level=logging.ERROR,
        )
    finally:
        log.removeHandler(bot)
        log.setLevel(old_level)
    assert ("#encode", "[started] hourly query started") in irc_rec.sent
    assert ("#encode", "[terminated] qid-1 exception: boom") in irc_rec.sent
