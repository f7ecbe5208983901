#!/usr/bin/env python
"""Capture the reference demo pipelines' golden event streams.

Drives the REFERENCE (ernstleierzopf/logdata-anomaly-miner at
/root/reference) fully in-process — its own AminerConfig.load_config,
AnalysisContext, SimpleByteStreamLineAtomizerFactory and detectors — over
deterministic corpora, with time.time() frozen so lines without a parsed
timestamp get a deterministic atom time, and writes the StreamPrinter
output per pipeline to tests/golden/demo_e2e/.

This is the capture half of the end-to-end parity claim (round-4 VERDICT
item 1): tests/test_demo_e2e_parity.py replays the equivalent pipelines on
the Spark engine and byte-compares the captured streams. Run this script
only where the reference tree + its importable subset exist; the captured
goldens are committed so the pytests work without it.

Usage: python scripts/capture_demo_golden.py [--check]
  --check: exit 1 if a fresh capture differs from any committed golden.
"""

from __future__ import annotations

import io
import os
import sys
import tempfile
import time

REFERENCE_LIB = "/root/reference/source/root/usr/lib/logdata-anomaly-miner"
HERE = os.path.dirname(os.path.abspath(__file__))
E2E_DIR = os.path.normpath(os.path.join(HERE, "..", "tests", "golden", "demo_e2e"))

# Frozen wall clock for atoms without a parsed timestamp:
# 2024-03-15 12:01:00 UTC — after every parsed corpus-1 timestamp, so the
# frozen time itself never triggers TimestampsUnsortedDetector.
FROZEN_TIME = 1710504060.0

# (config file, corpus file, golden output) per pipeline
PIPELINES = [
    ("ref_config.py", "corpus.log", "reference_stream.txt"),
    ("demo2_config.py", "corpus2.log", "reference_stream2.txt"),
    ("demo3_config.py", "corpus3.log", "reference_stream3.txt"),
    ("demo4_config.py", "corpus4.log", "reference_stream4.txt"),
    ("demo5_config.py", "corpus5.log", "reference_stream5.txt"),
    ("demo6_config.py", "corpus6.log", "reference_stream6.txt"),
    ("demo7_config.py", "corpus7.log", "reference_stream7.txt"),
    ("demo8_config.py", "corpus8.log", "reference_stream8.txt"),
    ("demo9_config.py", "corpus9.log", "reference_stream9.txt"),
    ("demo10_config.py", ("corpus10a.log", "corpus10b.log"), "reference_stream10.txt"),
    ("demo11_config.py", "corpus11.log", "reference_stream11.txt"),
    ("demo12_config.py", "corpus12.log", "reference_stream12.txt"),
    ("demo13_config.py", "corpus13.log", "reference_stream13.txt"),
    ("demo14_config.py", "corpus14.log", "reference_stream14.txt"),
    # PathDependentHistogramAnalysis iterates raw sets (all_path_set.pop(),
    # '", "'.join(mapping[0])) — its output depends on PYTHONHASHSEED, so
    # this pipeline is captured in a re-exec'd subprocess with the seed
    # pinned to 0 (round-5 VERDICT item 4)
    ("demo15_config.py", "corpus15.log", "reference_stream15.txt", {"hashseed": "0"}),
]


def capture(config_path: str, corpus_paths) -> str:
    sys.path.insert(0, REFERENCE_LIB)
    try:
        import defusedxml.ElementTree  # noqa: F401
    except ImportError:
        # harness shim: defusedxml mirrors the stdlib ElementTree API and
        # only adds hardening against malicious XML — our fixture corpora
        # are trusted, so alias the stdlib for the capture run
        import types
        import xml.etree.ElementTree as _ET

        pkg = types.ModuleType("defusedxml")
        pkg.ElementTree = _ET
        sys.modules["defusedxml"] = pkg
        sys.modules["defusedxml.ElementTree"] = _ET
    import aminer.AminerConfig as AminerConfig
    from aminer.AnalysisChild import AnalysisContext
    from aminer.events.StreamPrinterEventHandler import StreamPrinterEventHandler

    aminer_config = AminerConfig.load_config(config_path)
    if isinstance(corpus_paths, str):
        corpus_paths = [corpus_paths]
    clock = [FROZEN_TIME]
    real_time = time.time
    # freeze BEFORE the pipeline builds: components that stamp time at init
    # (e.g. SimpleMultisourceAtomSync's initial blocking window) must see
    # the deterministic clock, not the capture host's wall time
    time.time = lambda: clock[0]
    try:
        with tempfile.TemporaryDirectory() as tmp:
            aminer_config.config_properties["Core.PersistenceDir"] = tmp
            context = AnalysisContext(aminer_config)
            context.build_analysis_pipeline()

            out = io.StringIO()
            factory = context.atomizer_factory
            for h in factory.event_handler_list:
                if isinstance(h, StreamPrinterEventHandler):
                    h.stream = out

            feeds = []
            for i, cpath in enumerate(corpus_paths):
                with open(cpath, "rb") as fh:
                    feeds.append([
                        factory.get_atomizer_for_resource(
                            f"file:///parity{i}".encode()
                        ),
                        fh.read(),
                    ])
            # round-robin the sources (the real reader loop's select());
            # when EVERY source stalls (multisource sync blocking), advance
            # the deterministic clock past the sync window and retry
            stalled_rounds = 0
            while any(f[1] for f in feeds):
                progressed = False
                for f in feeds:
                    if not f[1]:
                        continue
                    consumed = f[0].consume_data(f[1], True)
                    if consumed > 0:
                        f[1] = f[1][consumed:]
                        progressed = True
                if progressed:
                    stalled_rounds = 0
                    continue
                stalled_rounds += 1
                clock[0] += 6.0  # > default sync_wait_time
                if stalled_rounds > 100:
                    left = sum(len(f[1]) for f in feeds)
                    raise RuntimeError(f"atomizers stalled with {left} bytes left")
            if getattr(aminer_config, "POST_DO_TIMER", False):
                # timer-driven components (ParserCount reports) fire via the
                # periodic do_timer interrupt in a real aminer run; replay it
                # once after the stream with a trigger far past every timer
                for comp in context.registered_components_by_name.values():
                    if not hasattr(comp, "do_timer"):
                        continue
                    try:
                        comp.do_timer(FROZEN_TIME + 1_000_000.0)
                    except Exception:
                        # detectors whose do_timer only PERSISTS need the
                        # aminer secure-fd machinery this harness does not
                        # set up; persistence failures cannot affect the
                        # event stream, which is all the golden captures
                        pass
            return out.getvalue()
    finally:
        time.time = real_time


def main() -> int:
    check = "--check" in sys.argv
    only = None
    if "--single" in sys.argv:
        only = sys.argv[sys.argv.index("--single") + 1]
    rc = 0
    for entry in PIPELINES:
        cfg, corpus, golden = entry[:3]
        opts = entry[3] if len(entry) > 3 else {}
        if only is not None and cfg != only:
            continue
        hashseed = opts.get("hashseed")
        if hashseed is not None and os.environ.get("PYTHONHASHSEED") != hashseed:
            # set-iteration-order-dependent pipeline: re-exec this script for
            # just this pipeline with the hash seed pinned
            import subprocess

            env = dict(os.environ, PYTHONHASHSEED=hashseed)
            args = [sys.executable, os.path.abspath(__file__), "--single", cfg]
            if check:
                args.append("--check")
            rc |= subprocess.run(args, env=env, check=False).returncode
            continue
        corpora = (
            [os.path.join(E2E_DIR, c) for c in corpus]
            if isinstance(corpus, tuple)
            else os.path.join(E2E_DIR, corpus)
        )
        got = capture(os.path.join(E2E_DIR, cfg), corpora)
        gpath = os.path.join(E2E_DIR, golden)
        if check:
            with open(gpath, encoding="utf-8") as fh:
                want = fh.read()
            if got != want:
                sys.stderr.write(f"golden drift in {golden}\n")
                rc = 1
            else:
                print(f"{golden} matches fresh reference capture")
        else:
            with open(gpath, "w", encoding="utf-8") as fh:
                fh.write(got)
            print(f"wrote {gpath} ({len(got)} bytes, {got.count(chr(10))} lines)")
    return rc


if __name__ == "__main__":
    sys.exit(main())
