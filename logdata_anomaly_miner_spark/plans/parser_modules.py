"""External parsing-model shim: the reference lets a config.yml ``Parser``
entry name a Python MODULE whose ``get_model()`` returns the element tree
(aminer/YamlConfig.py:147-180 imports it from /etc/aminer/conf-available).
This engine cannot import the reference's modules, so the same contract is
met with a REGISTRY mapping module type names to builders over this
package's parsing combinators.

Builders re-express the module's log FORMAT (public standard formats:
Apache combined access log, auditd, RFC3164 syslog, exim main log,
suricata fast/eve, dnsmasq, OpenVPN) with the leaf names the reference
modules use (conf-available/ait-lds/*.py), so config Analysis paths like
``/model/model/status_code`` bind the same columns. Structural shortcuts
versus the reference trees are recorded per-entry in the load's
``approximations`` ledger — byte-parity on every exotic sub-branch is NOT
claimed.

Builders receive ``(name, mk)`` where ``mk`` dedups leaf/group names
across the whole config (one compiled regex cannot repeat a group name
when several modules share leaves like ``time``).
"""

from __future__ import annotations

from collections.abc import Callable

from logdata_anomaly_miner_spark import parsing as P

_URLCHARS = (
    "!'#$%&\"()*+,-./0123456789:;<>?@ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    "\\^_`abcdefghijklmnopqrstuvwxyz{|}~=[]"
)


def _dt(mk: Callable[[str], str], name: str, strptime_fmt: str) -> P.Element:
    from logdata_anomaly_miner_spark.plans.reference_config import strptime_to_spark

    spark_fmt, rx = strptime_to_spark(strptime_fmt)
    return P.datetime_el(mk(name), spark_fmt, rx)


def apache_access(name: str, mk: Callable[[str], str]) -> P.Element:
    """Apache combined access log (reference conf-available/ait-lds/
    ApacheAccessParsingModel.py:15-69): client, identity, user, time,
    request triple, status, size, optional referer + user agent."""
    request = P.seq(
        P.wordlist(
            mk("method"),
            ["GET", "POST", "PUT", "HEAD", "DELETE", "CONNECT", "OPTIONS",
             "TRACE", "PATCH", "REPORT", "PROPFIND", "MKCOL"],
        ),
        P.fixed(" "),
        P.delimited(mk("request"), " ", consume_delimiter=False),
        P.fixed(" "),
        P.delimited(mk("version"), '"', consume_delimiter=False),
    )
    return P.seq(
        # reference nests two client_ip leaves in sibling branches (the
        # match tree keys by full path); a flat column namespace needs ONE
        # leaf serving both shapes, so the domain prefix is optional and
        # regex backtracking skips it when the line starts with the IP —
        # every branch binds the same client_ip column
        P.optional(
            P.seq(
                P.delimited(mk("domain"), " ", consume_delimiter=False),
                P.fixed(" "),
            )
        ),
        P.first_match(P.ip_address(mk("client_ip")), P.fixed("::1")),
        P.fixed(" "),
        P.variable_bytes(mk("client_id"), _URLCHARS),
        P.fixed(" "),
        P.variable_bytes(mk("user_id"), _URLCHARS),
        P.fixed(" ["),
        _dt(mk, "time", "%d/%b/%Y:%H:%M:%S %z"),
        P.fixed('] "'),
        P.first_match(P.fixed("-"), request),
        P.fixed('" '),
        P.decimal_integer(mk("status_code"), allow_sign=False),
        P.fixed(" "),
        P.decimal_integer(mk("content_size"), allow_sign=False),
        P.optional(
            P.seq(
                P.fixed(' "'),
                P.delimited(mk("referer"), '"', consume_delimiter=False),
                P.fixed('" "'),
                P.delimited(mk("user_agent"), '"', consume_delimiter=False),
                P.fixed('"'),
            )
        ),
    )


def auditd(name: str, mk: Callable[[str], str]) -> P.Element:
    """Linux auditd line: ``type=T msg=audit(epoch.frac:serial): body``
    (reference conf-available/ait-lds/AuditdParsingModel.py)."""
    tname = mk("time")
    return P.seq(
        P.fixed("type="),
        P.variable_bytes(mk("type"), "ABCDEFGHIJKLMNOPQRSTUVWXYZ_"),
        P.fixed(" msg=audit("),
        P.Element(P._grp(tname, r"\d+\.\d+"), tname, "double"),
        P.fixed(":"),
        P.decimal_integer(mk("seq"), allow_sign=False),
        P.fixed("): "),
        P.any_bytes(mk("audit_msg")),
    )


def apache_error(name: str, mk: Callable[[str], str]) -> P.Element:
    """Apache error log: ``[timestamp] [module:level] [pid N] message``
    (reference conf-available/ait-lds/ApacheErrorParsingModel.py)."""
    return P.seq(
        P.fixed("["),
        P.delimited(mk("err_time"), "]"),
        P.fixed(" ["),
        P.delimited(mk("level"), "]"),
        P.fixed(" "),
        P.any_bytes(mk("message")),
    )


def syslog(name: str, mk: Callable[[str], str]) -> P.Element:
    """RFC3164 syslog: ``Mon dd hh:mm:ss host body`` (reference
    conf-available/ait-lds/SyslogParsingModelAIT-LDSv1.py and v2)."""
    return P.seq(
        _dt(mk, "time", "%b %d %H:%M:%S"),
        P.fixed(" "),
        P.delimited(mk("host"), " "),
        P.any_bytes(mk("message")),
    )


def exim(name: str, mk: Callable[[str], str]) -> P.Element:
    """Exim main log: ``yyyy-mm-dd hh:mm:ss body`` (reference
    conf-available/ait-lds/EximParsingModel.py)."""
    return P.seq(
        _dt(mk, "time", "%Y-%m-%d %H:%M:%S"),
        P.fixed(" "),
        P.any_bytes(mk("message")),
    )


def suricata_fast(name: str, mk: Callable[[str], str]) -> P.Element:
    """Suricata fast.log: ``mm/dd/yyyy-hh:mm:ss.micros  [**] alert``
    (reference conf-available/ait-lds/SuricataFastParsingModel.py)."""
    return P.seq(
        _dt(mk, "time", "%m/%d/%Y-%H:%M:%S"),
        P.fixed("."),
        P.decimal_integer(mk("micros"), allow_sign=False),
        P.fixed("  [**] "),
        P.any_bytes(mk("alert")),
    )


def suricata_event(name: str, mk: Callable[[str], str]) -> P.Element:
    """Suricata eve.json line. The reference parses the full JSON event
    tree; inside a FirstMatch regex composite this shim captures the raw
    object for downstream JSON operators (sources/readers.parse_json_atoms)
    — a DOCUMENTED approximation (conf-available/ait-lds/
    SuricataEventParsingModel.py)."""
    return P.seq(P.fixed("{"), P.any_bytes(mk("event")))


def dns(name: str, mk: Callable[[str], str]) -> P.Element:
    """dnsmasq-over-syslog (reference conf-available/ait-lds/
    DnsParsingModel.py): syslog envelope + query body."""
    return syslog(name, mk)


def openvpn(name: str, mk: Callable[[str], str]) -> P.Element:
    """OpenVPN log: ``Www Mon dd hh:mm:ss yyyy body`` (reference
    conf-available/ait-lds/OpenVpnParsingModel.py)."""
    return P.seq(
        P.wordlist(mk("weekday"), ["Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun"]),
        P.fixed(" "),
        _dt(mk, "time", "%b %d %H:%M:%S"),
        P.fixed(" "),
        P.decimal_integer(mk("year"), allow_sign=False),
        P.fixed(" "),
        P.any_bytes(mk("message")),
    )


# type-name -> builder; names as the demo configs reference them
MODULE_REGISTRY: dict[str, Callable[[str, Callable[[str], str]], P.Element]] = {
    "ApacheAccessParsingModel": apache_access,
    "ApacheErrorParsingModel": apache_error,
    "AuditdParsingModel": auditd,
    "SyslogParsingModelAIT-LDSv1": syslog,
    "SyslogParsingModelAIT-LDSv2": syslog,
    "EximParsingModel": exim,
    "DnsParsingModel": dns,
    "OpenVpnParsingModel": openvpn,
    "SuricataFastParsingModel": suricata_fast,
    "SuricataEventParsingModel": suricata_event,
}
