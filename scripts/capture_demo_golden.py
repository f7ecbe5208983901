#!/usr/bin/env python
"""Capture the reference demo pipeline's golden event stream.

Drives the REFERENCE (ernstleierzopf/logdata-anomaly-miner at
/root/reference) fully in-process — its own AminerConfig.load_config,
AnalysisContext, SimpleByteStreamLineAtomizerFactory and detectors — over
tests/golden/demo_e2e/corpus.log, with time.time() frozen so lines without
a parsed timestamp get a deterministic atom time, and writes the
StreamPrinter output to tests/golden/demo_e2e/reference_stream.txt.

This is the capture half of the end-to-end parity claim (VERDICT round-4
item 1): tests/test_demo_e2e_parity.py replays the equivalent pipeline on
the Spark engine and byte-compares against the captured stream. Run this
script only where the reference tree + its importable subset exist; the
captured golden is committed so the pytest works without it.

Usage: python scripts/capture_demo_golden.py [--check]
  --check: exit 1 if a fresh capture differs from the committed golden.
"""

from __future__ import annotations

import io
import os
import sys
import tempfile
import time

REFERENCE_LIB = "/root/reference/source/root/usr/lib/logdata-anomaly-miner"
HERE = os.path.dirname(os.path.abspath(__file__))
E2E_DIR = os.path.join(HERE, "..", "tests", "golden", "demo_e2e")
CORPUS = os.path.normpath(os.path.join(E2E_DIR, "corpus.log"))
GOLDEN = os.path.normpath(os.path.join(E2E_DIR, "reference_stream.txt"))
CONFIG = os.path.normpath(os.path.join(E2E_DIR, "ref_config.py"))

# Frozen wall clock for atoms without a parsed timestamp (HomePath lines):
# 2024-03-15 12:01:00 UTC — after every parsed corpus timestamp, so the
# frozen time itself never triggers TimestampsUnsortedDetector.
FROZEN_TIME = 1710504060.0


def capture() -> str:
    sys.path.insert(0, REFERENCE_LIB)
    import aminer.AminerConfig as AminerConfig
    from aminer.AnalysisChild import AnalysisContext
    from aminer.events.StreamPrinterEventHandler import StreamPrinterEventHandler

    aminer_config = AminerConfig.load_config(CONFIG)
    with tempfile.TemporaryDirectory() as tmp:
        aminer_config.config_properties["Core.PersistenceDir"] = tmp
        context = AnalysisContext(aminer_config)
        context.build_analysis_pipeline()

        out = io.StringIO()
        for handler_list in _find_handler_lists(context):
            for h in handler_list:
                if isinstance(h, StreamPrinterEventHandler):
                    h.stream = out

        real_time = time.time
        time.time = lambda: FROZEN_TIME  # freeze BEFORE atoms flow
        try:
            atomizer = context.atomizer_factory.get_atomizer_for_resource(
                b"file:///tmp/parity_syslog"
            )
            with open(CORPUS, "rb") as fh:
                data = fh.read()
            while data:
                consumed = atomizer.consume_data(data, True)
                if consumed <= 0:
                    raise RuntimeError(f"atomizer stalled with {len(data)} bytes left")
                data = data[consumed:]
        finally:
            time.time = real_time
        return out.getvalue()


def _find_handler_lists(context):
    """Yield every event-handler list reachable from registered components
    (atomizer factory + detectors share the same list object here)."""
    seen = set()
    factory = context.atomizer_factory
    if factory is not None and id(factory.event_handler_list) not in seen:
        seen.add(id(factory.event_handler_list))
        yield factory.event_handler_list


def main() -> int:
    got = capture()
    if "--check" in sys.argv:
        with open(GOLDEN, encoding="utf-8") as fh:
            want = fh.read()
        if got != want:
            sys.stderr.write("golden drift: fresh reference capture differs\n")
            return 1
        print("golden matches fresh reference capture")
        return 0
    with open(GOLDEN, "w", encoding="utf-8") as fh:
        fh.write(got)
    print(f"wrote {GOLDEN} ({len(got)} bytes, {got.count(chr(10))} lines)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
