"""Log-relay fan-out (S15, full form): the reference's SMTP/IRC/Slack
log handlers and interactive status bots, re-expressed with injectable
transports.

Reference semantics re-implemented (behavior, not code):

* ``logs/messages.py:3-18`` — the message enum and template strings
  (kept verbatim so operators see identical text);
* ``logs/__init__.py:18-70`` — the ``Logger`` wrapper: format the
  enum/template, log via stdlib, then fan info/error/exception/critical
  to every registered bot.  ``debug`` deliberately does NOT fan, and
  ``bot=False`` suppresses the fan-out per call;
* ``logs/log.py:25-46`` — handler topology: file/stream handlers on the
  stdlib root, an SMTP handler at ERROR level with the fixed subject
  ``'Encode Job Failure'``, bots attached only when their config block
  is enabled;
* ``logs/bots/common.py:11,48-80`` — the addressed-message regex and
  the ``status`` reply: running jobs joined with ``', '`` (``'no jobs'``
  when idle), waiting count, pluralized ``item{s}``;
* ``logs/bots/irc_.py:67-119,136-163`` — command dispatch: channel
  messages must be addressed ``nick: cmd`` (nick compared
  case-insensitively), replies to channel messages are prefixed with
  the asker's nick, private queries are answered directly to the asker,
  unknown commands get the help message; every log record relays to the
  channel via ``emit``;
* ``logs/bots/slack.py:41-82,89-118`` — outbound messages carry the
  ``'{servername}> '`` prefix, inbound ``<@user>: cmd`` text parses
  with the same regex, and only messages addressed to the bot's own
  username are answered.

The wire protocols themselves (IRC sockets, Slack RTM, SMTP delivery)
stay OUT of engine scope: each relay takes a transport callable
``(target, message) -> None`` (or an SMTP sender), so tests — and any
deployment — supply the delivery mechanism.  Relays are driver-side
logging observers, exactly like the reference's handlers: nothing here
runs on executors, and attaching them to the
``encodesrv_spark.streaming`` logger puts them downstream of the
``StreamingQueryListener`` in ``listener.py`` — engine telemetry flows
listener → logging → relays with no extra wiring.

(The reference's bot factory only matches the literal kind ``'irc_'``
while its setup code asks for ``'irc'`` — ``bots/__init__.py:10`` vs
``log.py:46`` — so its IRC path raises ``UnboundLocalError`` at
startup.  ``get_relay`` here accepts both spellings.)
"""

from __future__ import annotations

import enum
import logging
import re
from collections.abc import Callable, Iterable, Sequence
from dataclasses import dataclass, field

#: ``(target, message)`` — e.g. an IRC channel/nick or a Slack channel.
Transport = Callable[[str, str], None]

#: Addressed-message shape shared by IRC and Slack inputs
#: (reference logs/bots/common.py:11, pattern verbatim).
PRIVMSG_RE = re.compile(r"^<?@?([^ |^>]*)>?: *(.*)")

SMTP_SUBJECT = "Encode Job Failure"  # reference logs/log.py:36


class Message(enum.Enum):
    """Reference ``Message_enum`` (logs/messages.py:3-9)."""

    status = 1
    unknown_cmd = 2
    start_job = 3
    finish_job = 4
    start_server = 5


#: Template strings verbatim (reference logs/messages.py:12-18).
MESSAGES: dict[Message, str] = {
    Message.status: "Currently encoding {enc_jobs}, with {wait_jobs} item{pl} waiting.",
    Message.unknown_cmd: "I don't know what you're asking.",
    Message.start_job: "Starting job {id_}: {name}.",
    Message.finish_job: "Finished job {id_}: {name}.",
    Message.start_server: "Starting up Encodesrv.",
}


def format_message(msg: Message | str, data: dict | None = None) -> str:
    """Enum → template → formatted string; plain strings pass through
    (reference logs/__init__.py:31-37)."""
    if isinstance(msg, Message):
        msg = MESSAGES[msg]
        if data is not None:
            msg = msg.format(**data)
    return msg


def form_status_message(currently_encoding: Sequence[str], waiting: int) -> str:
    """The bots' ``status`` reply (reference logs/bots/common.py:48-80):
    comma-joined running jobs — ``'no jobs'`` when idle — plus the
    pluralized waiting count."""
    enc = ", ".join(currently_encoding) if currently_encoding else "no jobs"
    return format_message(
        Message.status,
        {"enc_jobs": enc, "wait_jobs": waiting, "pl": "" if int(waiting) == 1 else "s"},
    )


def parse_addressed(text: str) -> tuple[str, str] | None:
    """``'<@user>: cmd'`` / ``'user: cmd'`` → ``(user, cmd)``; None when
    the text is not an addressed message."""
    matches = PRIVMSG_RE.findall(text)
    if len(matches) != 1:
        return None
    user, cmd = matches[0]
    return user, cmd


def dispatch_command(cmd: str, status_provider: Callable[[], str]) -> str:
    """``status`` → the live status message, anything else → help
    (reference logs/bots/irc_.py:99-102, slack.py:77-80)."""
    if cmd == "status":
        return status_provider()
    return format_message(Message.unknown_cmd)


# ---------------------------------------------------------------------------
# Relays
# ---------------------------------------------------------------------------


class IrcRelay(logging.Handler):
    """IRC-shaped relay: log records go to the home channel; addressed
    commands are answered with reference reply semantics."""

    def __init__(
        self,
        transport: Transport,
        *,
        nick: str,
        channel: str,
        status_provider: Callable[[], str],
        level: int = logging.INFO,
    ) -> None:
        super().__init__(level=level)
        self.transport = transport
        self.nick = nick
        self.channel = channel
        self.status_provider = status_provider

    # logging.Handler — every record relays (reference irc_.py:153-163)
    def emit(self, record: logging.LogRecord) -> None:
        self.send_msg(record.getMessage())

    def send_msg(self, msg: str, channel: str | None = None) -> None:
        self.transport(self.channel if channel is None else channel, msg)

    def handle_message(self, source_nick: str, text: str, private: bool = False) -> None:
        """One inbound line (reference irc_.py:67-109): channel text must
        be addressed ``nick: cmd``; private text is the command itself."""
        if private:
            cmd = text.strip()
        else:
            head, sep, rest = text.partition(":")
            if not sep or head.strip().lower() != self.nick.lower():
                return  # not addressed to us
            cmd = rest.strip()
        msg = dispatch_command(cmd, self.status_provider)
        if private:
            self.send_msg(msg, channel=source_nick)
        else:
            self.send_msg(f"{source_nick}: {msg}")


class SlackRelay(logging.Handler):
    """Slack-shaped relay: outbound text carries the servername prefix;
    only messages addressed to the bot's own username are answered."""

    def __init__(
        self,
        transport: Transport,
        *,
        servername: str,
        username: str,
        channel: str,
        status_provider: Callable[[], str],
        level: int = logging.INFO,
    ) -> None:
        super().__init__(level=level)
        self.transport = transport
        self.servername = servername
        self.username = username
        self.channel = channel
        self.status_provider = status_provider

    def emit(self, record: logging.LogRecord) -> None:
        self.send_msg(record.getMessage())

    def send_msg(self, msg: str) -> None:
        # reference slack.py:50 — every outbound RTM send is prefixed
        self.transport(self.channel, f"{self.servername}> {msg}")

    def handle_message(self, text: str) -> None:
        """One inbound RTM text (reference slack.py:66-82)."""
        parsed = parse_addressed(text)
        if parsed is None:
            return
        user, cmd = parsed
        if user != self.username:
            return
        self.send_msg(dispatch_command(cmd, self.status_provider))


#: ``(fromaddr, toaddrs, subject, body) -> None``
SmtpSender = Callable[[str, tuple[str, ...], str, str], None]


class SmtpRelay(logging.Handler):
    """ERROR-threshold mail relay (reference log.py:32-38: stdlib
    ``SMTPHandler`` with the fixed failure subject)."""

    def __init__(
        self,
        sender: SmtpSender,
        *,
        fromaddr: str,
        toaddrs: Iterable[str],
        subject: str = SMTP_SUBJECT,
        level: int = logging.ERROR,
    ) -> None:
        super().__init__(level=level)
        self.sender = sender
        self.fromaddr = fromaddr
        self.toaddrs = tuple(toaddrs)
        self.subject = subject

    def emit(self, record: logging.LogRecord) -> None:
        self.sender(self.fromaddr, self.toaddrs, self.subject, self.format(record))


# ---------------------------------------------------------------------------
# Fan-out logger + registry
# ---------------------------------------------------------------------------


@dataclass
class RelayHub:
    """The reference's module-level ``_bots`` list, as an object
    (logs/bots/__init__.py:5-16) — holds every constructed relay and
    fans bot-destined messages to all of them."""

    bots: list[IrcRelay | SlackRelay] = field(default_factory=list)

    def get_relay(self, kind: str, **kwargs) -> IrcRelay | SlackRelay:
        if kind in ("irc", "irc_"):  # both spellings; see module docstring
            bot: IrcRelay | SlackRelay = IrcRelay(**kwargs)
        elif kind == "slack":
            bot = SlackRelay(**kwargs)
        else:
            raise ValueError(f"unknown relay kind: {kind!r}")
        self.bots.append(bot)
        return bot

    def broadcast(self, msg: str) -> None:
        for bot in self.bots:
            bot.send_msg(msg)


class RelayLogger:
    """The reference ``Logger`` wrapper (logs/__init__.py:18-70): each
    level formats, logs via stdlib, and — except ``debug`` — fans to
    the hub's bots unless ``bot=False``."""

    def __init__(self, name: str, hub: RelayHub) -> None:
        self._logger = logging.getLogger(name)
        self._hub = hub

    def _fan(self, msg: str) -> None:
        self._hub.broadcast(msg)

    def info(self, msg: Message | str, data: dict | None = None, bot: bool = True) -> None:
        msg = format_message(msg, data)
        self._logger.info(msg)
        if bot:
            self._fan(msg)

    def debug(self, msg: Message | str, data: dict | None = None, bot: bool = True) -> None:
        # reference logs/__init__.py:46-49: debug never reaches bots
        self._logger.debug(format_message(msg, data))

    def error(self, msg: Message | str, data: dict | None = None, bot: bool = True) -> None:
        msg = format_message(msg, data)
        self._logger.error(msg)
        if bot:
            self._fan(msg)

    def exception(self, msg: Message | str, data: dict | None = None, bot: bool = True) -> None:
        msg = format_message(msg, data)
        self._logger.exception(msg)
        if bot:
            self._fan(msg)

    def critical(self, msg: Message | str, data: dict | None = None, bot: bool = True) -> None:
        msg = format_message(msg, data)
        self._logger.critical(msg)
        if bot:
            self._fan(msg)


def setup_relays(
    config: dict,
    *,
    status_provider: Callable[[], str],
    logger_name: str = "encodesrv_spark.streaming",
    smtp_sender: SmtpSender | None = None,
    irc_transport: Transport | None = None,
    slack_transport: Transport | None = None,
) -> RelayHub:
    """The reference's ``setup_logging`` topology (logs/log.py:14-48):
    attach an ERROR-level SMTP handler and enabled bots to
    ``logger_name`` — by default the logger the streaming
    ``LogRelayListener`` emits to, so query lifecycle events flow
    straight through.  Each relay only attaches when its config block
    has ``enabled: true`` AND its transport was supplied.

    Delivery paths are exclusive per logger: bots attached here receive
    records through stdlib logging (the engine-telemetry path the
    reference lacked), while a ``RelayLogger`` fans to the hub directly
    (the reference's interactive path, logs/__init__.py:26-29).  Point
    a ``RelayLogger`` at a *different* logger name (e.g.
    ``encodesrv_spark.app``) — on the same name each bot would receive
    one copy per path.  (In the reference only SMTP is a real handler;
    bots are fanned manually, log.py:25-46.)"""
    hub = RelayHub()
    log = logging.getLogger(logger_name)

    mail = config.get("mail", {})
    if mail.get("enabled") and smtp_sender is not None:
        log.addHandler(
            SmtpRelay(smtp_sender, fromaddr=mail["from"], toaddrs=mail["to"])
        )

    slack = config.get("slack", {})
    if slack.get("enabled") and slack_transport is not None:
        bot = hub.get_relay(
            "slack",
            transport=slack_transport,
            servername=config.get("servername", "encodesrv"),
            username=slack.get("username", "encodesrv"),
            channel=slack["channel"],
            status_provider=status_provider,
        )
        log.addHandler(bot)

    irc = config.get("irc", {})
    if irc.get("enabled") and irc_transport is not None:
        bot = hub.get_relay(
            "irc",
            transport=irc_transport,
            nick=irc.get("nick", "encodesrv"),
            channel=irc["channel"],
            status_provider=status_provider,
        )
        log.addHandler(bot)

    return hub
