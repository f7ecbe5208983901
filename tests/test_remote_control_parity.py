"""Byte-parity for the remote-control channel (plans/remote_control.py) vs
the reference AnalysisChildRemoteControlHandler + execution methods, driven
live in-process: the reference's own put_execute_request generates each
request packet, both handlers process the SAME bytes against equivalent
contexts, and the full RRRR response packets are byte-compared for every
success and validation-failure branch. (Exception branches compare shape,
not bytes — tracebacks embed host paths.)

Deliberate deviation, asserted below: the reference exec()s arbitrary
Python from the socket (AnalysisChild.py:677); this engine parses the
command and dispatches only registered named methods.
"""

from __future__ import annotations

import importlib.machinery
import os
import sys
import types

import pytest

from logdata_anomaly_miner_spark.plans.remote_control import (
    EngineControlContext,
    RemoteControlHandler,
)

REFERENCE_LIB = "/root/reference/source/root/usr/lib/logdata-anomaly-miner"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_LIB), reason="reference tree not present"
)


class NewMatchPathValueDetector:
    """Engine-side stand-in whose CLASS NAME satisfies the reference's
    allowlistable-class check; allowlist_event mirrors the detector
    contract (returns the status message)."""

    def __init__(self):
        self.allowlisted = []

    def allowlist_event(self, event_type, event_data, allowlisting_data):
        self.allowlisted.append(event_data)
        return f"Allowlisted path(es) in {event_type}: {event_data}"


class PlainComponent:
    """No allowlist/blocklist support — exercises the FAILURE branches."""


def _shim_missing_scientific_modules():
    """do_process imports the full aminer.analysis namespace
    (AnalysisChild.py:606), which pulls scipy/statsmodels/kneed — absent in
    this container. The commands under test never execute those detectors,
    so placeholder attributes satisfy the imports (same trick as the
    capture harness's defusedxml shim). The shims must persist for the
    whole test (do_process re-imports aminer.analysis lazily per call), so
    each gets a real ModuleSpec: a bare ModuleType has ``__spec__ = None``,
    which makes ``importlib.util.find_spec("scipy")`` raise ValueError in
    any later import that probes for scipy (e.g. pyspark.testing during
    SparkSession creation)."""

    def shim(name, attrs):
        if name in sys.modules:
            return
        mod = types.ModuleType(name)
        mod.__spec__ = importlib.machinery.ModuleSpec(
            name, None, is_package=(name == "scipy")
        )
        for a in attrs:
            setattr(mod, a, object())
        sys.modules[name] = mod

    shim("scipy", [])
    shim(
        "scipy.stats",
        ["kstest", "ks_2samp", "norm", "multinomial", "distributions", "chisquare"],
    )
    sys.modules["scipy"].stats = sys.modules["scipy.stats"]


def _ref_setup():
    if REFERENCE_LIB not in sys.path:
        sys.path.insert(0, REFERENCE_LIB)
    _shim_missing_scientific_modules()
    import aminer.AnalysisChild as AC

    fake_sock = types.SimpleNamespace(fileno=lambda: -1, close=lambda: None)
    handler = AC.AnalysisChildRemoteControlHandler(fake_sock)
    cfg = types.SimpleNamespace(
        config_properties={"LogPrefix": "myprefix", "Core.PersistencePeriod": 600}
    )
    ctx = AC.AnalysisContext(cfg)
    ctx.register_component(NewMatchPathValueDetector(), "NVD")
    ctx.register_component(PlainComponent(), "Plain")
    ctx.register_component(PlainComponent(), "CompA")
    return AC, handler, ctx


def _eng_setup():
    handler = RemoteControlHandler()
    ctx = EngineControlContext(
        {"LogPrefix": "myprefix", "Core.PersistencePeriod": 600}
    )
    ctx.register_component(NewMatchPathValueDetector(), "NVD")
    ctx.register_component(PlainComponent(), "Plain")
    ctx.register_component(PlainComponent(), "CompA")
    return handler, ctx


COMMANDS = [
    "suspend",
    "suspend_aminer()",
    "activate_aminer()",
    'print_config_property(analysis_context, "LogPrefix")',
    'print_config_property(analysis_context, "Core.PersistencePeriod")',
    'print_config_property(analysis_context, "Missing.Key")',
    'change_config_property(analysis_context, "MailAlerting.TargetAddress", "root@localhost")',
    'change_config_property(analysis_context, "MailAlerting.TargetAddress", "not-an-email")',
    'change_config_property(analysis_context, "Unknown.Prop", "x")',
    'change_config_property(analysis_context, "MailAlerting.EventCollectTime", "10")',
    'change_config_property(analysis_context, "MailAlerting.EventCollectTime", 42)',
    'change_config_property(analysis_context, "Log.DebugLevel", 7)',
    'change_config_property(analysis_context, "Resources.MaxMemoryUsage", 16)',
    'rename_registered_analysis_component(analysis_context, "CompA", "CompB")',
    'rename_registered_analysis_component(analysis_context, "CompX", "CompY")',
    'allowlist_event_in_component(analysis_context, "NVD", "/model/path/value")',
    'allowlist_event_in_component(analysis_context, "Plain", "/model/path/value")',
    'allowlist_event_in_component(analysis_context, "Ghost", "/model/path/value")',
    'blocklist_event_in_component(analysis_context, "Plain", "/model/path/value")',
    'persist_all()',
]


def test_remote_control_byte_parity():
    AC, ref, ref_ctx = _ref_setup()
    eng, eng_ctx = _eng_setup()

    for cmd in COMMANDS:
        # the REFERENCE generates the request bytes; both sides consume them
        ref.put_execute_request(cmd, None)
        request = ref.output_buffer
        ref.output_buffer = b""

        # client-side framing parity
        eng.put_execute_request(cmd, None)
        assert eng.output_buffer == request, cmd
        eng.output_buffer = b""

        ref.input_buffer += request
        eng.input_buffer += request
        assert ref.may_get() and eng.may_get()
        ref.do_process(ref_ctx)
        eng.do_process(eng_ctx)
        assert eng.output_buffer == ref.output_buffer, (
            f"response mismatch for {cmd}:\n ref={ref.output_buffer!r}\n eng={eng.output_buffer!r}"
        )
        ref.output_buffer = b""
        eng.output_buffer = b""

    # state effects converged
    assert AC.suspended_flag is False and eng_ctx.suspended_flag is False
    assert (
        eng_ctx.config_properties["MailAlerting.TargetAddress"] == "root@localhost"
        == ref_ctx.aminer_config.config_properties["MailAlerting.TargetAddress"]
    )
    assert (
        eng_ctx.config_properties["MailAlerting.EventCollectTime"] == 42
        == ref_ctx.aminer_config.config_properties["MailAlerting.EventCollectTime"]
    )
    assert eng_ctx.get_component_by_name("CompB") is not None
    assert ref_ctx.get_component_by_name("CompB") is not None
    assert eng_ctx.get_component_by_name("NVD").allowlisted == ["/model/path/value"]
    assert ref_ctx.get_component_by_name("NVD").allowlisted == ["/model/path/value"]


def test_suspend_activate_state():
    eng, ctx = _eng_setup()
    eng.put_execute_request("suspend", None)
    eng.input_buffer, eng.output_buffer = eng.output_buffer, b""
    eng.do_process(ctx)
    assert ctx.suspended_flag is True
    eng.input_buffer, eng.output_buffer = b"", b""
    eng.put_execute_request("activate", None)
    eng.input_buffer, eng.output_buffer = eng.output_buffer, b""
    eng.do_process(ctx)
    assert ctx.suspended_flag is False


def test_arbitrary_code_is_refused():
    """The no-exec guarantee: code the reference would happily exec comes
    back as an exception response and has no side effects."""
    eng, ctx = _eng_setup()
    for evil in (
        "__import__('os').system('true')",
        "analysis_context.config_properties.clear()",
        "print_config_property(analysis_context, __import__('os').getcwd())",
    ):
        eng.input_buffer, eng.output_buffer = b"", b""
        eng.put_execute_request(evil, None)
        eng.input_buffer, eng.output_buffer = eng.output_buffer, b""
        eng.do_process(ctx)
        body = eng.output_buffer[8:].decode()
        assert body.startswith('["Traceback') or body.startswith('["'), evil
        assert '"Traceback' in body.split(",")[0] or "unsupported" in body
    assert ctx.config_properties["LogPrefix"] == "myprefix"


BYTES_PAYLOAD_COMMANDS = [
    # (command, data) — data reaches the command as remote_control_data
    (
        'allowlist_event_in_component(analysis_context, "NVD", remote_control_data)',
        b"/model/path \xc3\xa4 100%",
    ),
    (
        'allowlist_event_in_component(analysis_context, "NVD", remote_control_data)',
        [b"/a", "keep", 7],
    ),
]


def test_remote_control_bytes_payload_parity():
    """Framing and responses with BYTES data payloads: the percent-escape
    codec (JsonUtil.encode_object + StringUtil.encode_byte_string_as_string)
    and the post-decode bytes→str normalization (AnalysisChild.py:594-605).
    The COMMANDS loop only ever sends None data, which is how the codec
    divergence originally escaped it."""
    AC, ref, ref_ctx = _ref_setup()
    eng, eng_ctx = _eng_setup()

    for cmd, data in BYTES_PAYLOAD_COMMANDS:
        ref.put_execute_request(cmd, data)
        request = ref.output_buffer
        ref.output_buffer = b""

        eng.put_execute_request(cmd, data)
        assert eng.output_buffer == request, (cmd, data)
        eng.output_buffer = b""

        ref.input_buffer += request
        eng.input_buffer += request
        assert ref.may_get() and eng.may_get()
        ref.do_process(ref_ctx)
        eng.do_process(eng_ctx)
        assert eng.output_buffer == ref.output_buffer, (
            f"response mismatch for {cmd} data={data!r}:\n"
            f" ref={ref.output_buffer!r}\n eng={eng.output_buffer!r}"
        )
        ref.output_buffer = b""
        eng.output_buffer = b""

    # both sides decoded the payloads to the same post-normalization values
    want = ["/model/path ä 100%", ["/a", "keep", 7]]
    assert eng_ctx.get_component_by_name("NVD").allowlisted == want
    assert ref_ctx.get_component_by_name("NVD").allowlisted == want


def test_remote_control_data_type_quirks():
    """Bug-for-bug post-decode quirk: truthy non-list data that is not
    UTF-8-decodable bytes (an int, a str, invalid bytes) hits ``.decode()``
    and lands in the exception slot on BOTH sides. Tracebacks embed file
    paths, so compare response structure rather than bytes."""
    import json as _json

    AC, ref, ref_ctx = _ref_setup()
    eng, eng_ctx = _eng_setup()
    cmd = 'print_config_property(analysis_context, "LogPrefix")'

    for data in (42, "a-str", b"\xff\xfe"):
        for handler, ctx in ((ref, ref_ctx), (eng, eng_ctx)):
            handler.input_buffer, handler.output_buffer = b"", b""
            handler.put_execute_request(cmd, data)
            handler.input_buffer, handler.output_buffer = handler.output_buffer, b""
            handler.do_process(ctx)
            exc, resp = _json.loads(handler.output_buffer[8:].decode())
            assert exc is not None and resp is None, (data, handler.output_buffer)


def test_mail_property_change_propagates_to_live_collector():
    """change_config_property must reach live mail handlers, mirroring the
    reference's setattr loop (AminerRemoteControlExecutionMethods.py:108-117)
    — not just config_properties bookkeeping."""
    from logdata_anomaly_miner_spark.plans.sinks import MailAlertCollector

    eng, ctx = _eng_setup()
    collector = MailAlertCollector(
        lambda f, t, m: None, "root@localhost", "root@localhost"
    )
    ctx.register_component(collector, "Mail")

    cmd = (
        'change_config_property(analysis_context, '
        '"MailAlerting.TargetAddress", "ops@localhost")'
    )
    eng.put_execute_request(cmd, None)
    eng.input_buffer, eng.output_buffer = eng.output_buffer, b""
    eng.do_process(ctx)
    assert b"successfully" in eng.output_buffer
    assert ctx.config_properties["MailAlerting.TargetAddress"] == "ops@localhost"
    assert collector.target_address == "ops@localhost"
    # unrelated property classes leave the collector untouched
    eng.input_buffer, eng.output_buffer = b"", b""
    eng.put_execute_request(
        'change_config_property(analysis_context, "MailAlerting.MaxAlertGap", 900)',
        None,
    )
    eng.input_buffer, eng.output_buffer = eng.output_buffer, b""
    eng.do_process(ctx)
    assert collector.max_alert_gap == 900
    # a live prefix change renders exactly like a construction-time one:
    # the collector stores shlex.quote()d string props (sinks.py invariant)
    eng.input_buffer, eng.output_buffer = b"", b""
    eng.put_execute_request(
        'change_config_property(analysis_context, '
        '"MailAlerting.SubjectPrefix", "nightly alerts:")',
        None,
    )
    eng.input_buffer, eng.output_buffer = eng.output_buffer, b""
    eng.do_process(ctx)
    import shlex

    assert collector.subject_prefix == shlex.quote("nightly alerts:")


def test_bytes_codec_roundtrip_vs_reference():
    """encode_object/decode_object against the reference codec over every
    byte value (StringUtil.py:85-120)."""
    if REFERENCE_LIB not in sys.path:
        sys.path.insert(0, REFERENCE_LIB)
    from aminer.util import StringUtil

    from logdata_anomaly_miner_spark.plans.remote_control import (
        decode_object,
        encode_object,
    )

    payload = bytes(range(256))
    assert encode_object(payload) == (
        "bytes:" + StringUtil.encode_byte_string_as_string(payload)
    )
    assert decode_object(encode_object(payload)) == payload
    # and the reference decodes our wire form back to the same bytes
    assert StringUtil.decode_string_as_byte_string(
        encode_object(payload)[len("bytes:"):]
    ) == payload


def test_persist_callback_and_fd_transport(tmp_path):
    """persist_all reaches the injected callback; the fd path (do_receive/
    do_send) moves real bytes over a socketpair."""
    import socket

    calls = []
    a, b = socket.socketpair()
    eng = RemoteControlHandler(a)
    client = RemoteControlHandler(b)
    ctx = EngineControlContext({}, persist=lambda: calls.append(1))

    client.put_execute_request("persist_all()", None)
    client.do_send()
    eng.do_receive()
    eng.do_process(ctx)
    eng.do_send()
    client.do_receive()
    resp = client.do_get()
    assert calls == [1]
    assert resp[4:8] == b"RRRR" and b'"OK"' in resp
    a.close()
    b.close()
