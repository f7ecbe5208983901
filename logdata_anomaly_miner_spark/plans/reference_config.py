"""Load a reference-format aminer ``config.yml`` and compile it onto this
engine.

The reference configures everything through one YAML file validated by
YamlConfig (aminer/YamlConfig.py:28-96; examples in
aecid-testsuite/demo/*.yml): a ``Parser`` section of id-referenced model
elements composing a model DAG, an ``Input`` section (timestamp paths), an
``Analysis`` section of match rules and detectors, and event handlers.
This loader maps that exact schema onto the engine's native pieces —
``Parser`` entries to parsing.py Elements, rule entries to operators/rules
Column combinators, detector entries to builders over the operator
library — so a reference deployment's config drives this engine for the
supported component set.

Semantics notes:

- **Paths → columns.** Reference parser paths (``/model/DailyCron/UName``)
  address the match tree; the engine's ``parse()`` emits one column per
  NAMED element (sanitized name). The loader maps a path to the sanitized
  last segment, which is unique whenever the reference model would be
  (AMiner, too, keys match_dict entries by full path but detectors
  configure leaf values).
- **Lenient vs strict.** ``strict=True`` raises on any unsupported
  component type; the default collects them in ``skipped`` (id, reason)
  and builds everything else — a real config loads partially rather than
  not at all, and the skip list says exactly what to port by hand.
- **Detectors become builders.** Each supported Analysis entry compiles to
  a callable ``(DataFrame) -> DataFrame`` producing that detector's
  violation rows over a parsed batch; learn-mode state is the engine's
  baseline-table convention (operators/*, plans/persistence.py), not
  hidden in the callable.
"""

from __future__ import annotations

import re
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from logdata_anomaly_miner_spark import parsing as P
from logdata_anomaly_miner_spark.operators import rules as R


class ReferenceConfigError(ValueError):
    pass


def _sanitize(name: str) -> str:
    return re.sub(r"[^A-Za-z0-9]", "", name)


def path_col(path: str) -> str:
    """Reference parser path -> engine column (sanitized last segment)."""
    return _sanitize(path.rstrip("/").rsplit("/", 1)[-1])


# ---------------------------------------------------------------------------
# strptime -> (spark datetime format, regex) for DateTimeModelElement
# ---------------------------------------------------------------------------

_STRPTIME = {
    "%Y": ("yyyy", r"\d{4}"),
    "%y": ("yy", r"\d{2}"),
    "%m": ("MM", r"\d{2}"),
    "%d": ("dd", r"\d{2}"),
    "%H": ("HH", r"\d{2}"),
    "%M": ("mm", r"\d{2}"),
    "%S": ("ss", r"\d{2}"),
    "%b": ("MMM", r"[A-Za-z]{3}"),
    "%f": ("SSSSSS", r"\d{1,6}"),
    "%z": ("XX", r"[+-]\d{4}"),
    "%%": (None, "%"),
}


def strptime_to_spark(fmt: str) -> tuple[str, str]:
    """Translate a reference strptime date_format into (Spark format,
    matching regex). Literal letters are single-quoted for Spark."""
    out_fmt: list[str] = []
    out_rx: list[str] = []
    i = 0
    while i < len(fmt):
        if fmt[i] == "%":
            d = fmt[i : i + 2]
            if d not in _STRPTIME:
                raise ReferenceConfigError(f"unsupported strptime directive {d!r}")
            sf, rx = _STRPTIME[d]
            if sf is None:  # literal percent
                out_fmt.append("%")
                out_rx.append(re.escape(rx))
            else:
                out_fmt.append(sf)
                out_rx.append(rx)
            i += 2
        else:
            ch = fmt[i]
            out_fmt.append(f"'{ch}'" if ch.isalpha() else ch)
            out_rx.append(re.escape(ch))
            i += 1
    return "".join(out_fmt), "".join(out_rx)


# ---------------------------------------------------------------------------
# Parser section -> Elements
# ---------------------------------------------------------------------------

def _clone_suffixed(e: P.Element, idx: int) -> P.Element:
    """Deep copy of an element subtree with every named group suffixed —
    reference models reuse one component in several branches, but a single
    compiled regex cannot define a group name twice."""
    pat = re.sub(r"\(\?<(\w+)>", lambda m: f"(?<{m.group(1)}v{idx}>", e.pattern)
    return P.Element(
        pat,
        f"{e.name}v{idx}" if e.name else None,
        e.caster,
        [_clone_suffixed(c, idx) for c in e.children],
    )


def _build_element(
    entry: dict,
    elements: dict[str, P.Element],
    approximations: list[tuple[str, str]] | None = None,
    ref_counts: dict[str, int] | None = None,
) -> P.Element:
    t = entry["type"]
    name = entry.get("name")
    args = entry.get("args")

    def ref(eid) -> P.Element:
        if not isinstance(eid, str) or eid not in elements:
            raise ReferenceConfigError(
                f"element {entry.get('id')!r} references unknown id {eid!r}"
            )
        if ref_counts is not None:
            n = ref_counts.get(eid, 0) + 1
            ref_counts[eid] = n
            if n > 1:  # re-referenced subtree: clone with fresh group names
                return _clone_suffixed(elements[eid], n)
        return elements[eid]

    if t == "FixedDataModelElement":
        return P.fixed(str(args))
    if t == "FixedWordlistDataModelElement":
        return P.wordlist(name, [str(a) for a in args])
    if t == "AnyByteDataModelElement":
        return P.any_bytes(name)
    if t == "DelimitedDataModelElement":
        # the reference leaves the delimiter UNCONSUMED unless
        # consume_delimiter: True (DelimitedDataModelElement.py default)
        return P.delimited(
            name,
            str(entry.get("delimiter", args)),
            consume_delimiter=bool(entry.get("consume_delimiter", False)),
        )
    if t == "VariableByteDataModelElement":
        return P.variable_bytes(name, str(args))
    if t == "WhiteSpaceLimitedDataModelElement":
        return P.whitespace_limited(name)
    if t == "HexStringModelElement":
        return P.hex_string(name, allow_upper=bool(entry.get("upper_case", False)))
    if t == "Base64StringModelElement":
        return P.base64_string(name)
    if t == "DecimalIntegerValueModelElement":
        # reference default value_sign_type 'none'
        return P.decimal_integer(name, allow_sign=entry.get("value_sign_type", "none") != "none")
    if t == "DecimalFloatValueModelElement":
        return P.decimal_float(name)
    if t == "IpAddressDataModelElement":
        return P.ip_address_v6(name) if entry.get("ipv6", False) else P.ip_address(name)
    if t == "DateTimeModelElement":
        spark_fmt, rx = strptime_to_spark(entry["date_format"])
        return P.datetime_el(name, spark_fmt, rx)
    if t == "DebugModelElement":
        return P.debug_el(name or "debug")
    if t == "SequenceModelElement":
        return P.seq(*[ref(a) for a in args])
    if t == "FirstMatchModelElement":
        return P.first_match(*[ref(a) for a in args])
    if t == "OptionalMatchModelElement":
        return P.optional(ref(args if isinstance(args, str) else args[0]))
    if t == "RepeatedElementDataModelElement":
        child = ref(args if isinstance(args, str) else args[0])
        return P.repeated(
            child,
            min_n=int(entry.get("min_repeats", 0)),
            max_n=entry.get("max_repeats"),
            name=name,
        )
    if t == "MultiLocaleDateTimeModelElement":
        # match side: first-match union of the format regexes, value
        # captured as TEXT ('%b' widened to any-letter for localized month
        # names). The typed conversion is the downstream
        # parsing.datetime_multi_locale Column (coalesced
        # try_to_timestamp per format + month-name translation) — the
        # loader keeps the MODEL's accept/reject behavior in the regex.
        rxs = []
        for df_entry in entry.get("date_formats", []):
            f = df_entry.get("format") if isinstance(df_entry, dict) else df_entry
            fmt = f[0] if isinstance(f, (list, tuple)) else f
            if fmt is None:
                continue
            try:
                _, rx = strptime_to_spark(fmt)
            except ReferenceConfigError:
                continue
            rxs.append(rx.replace("[A-Za-z]{3}", r"\p{L}{3}\.?"))
        if not rxs:
            raise ReferenceConfigError("no translatable date_formats")
        if approximations is not None:
            approximations.append(
                (entry.get("id", t), "value captured as text; cast via datetime_multi_locale")
            )
        return P.Element(P._grp(name, "|".join(f"(?:{r})" for r in rxs)), name)
    if t == "ElementValueBranchModelElement":
        # regex approximation: value model followed by first-match over
        # ALL branch models — accepts (value_x, branch_of_y) combos the
        # reference would reject; exact value->branch coupling is the
        # post-parse parsing.parse_value_branches operator. Recorded as
        # an approximation so the caller can tighten downstream.
        vm = ref(args[0] if isinstance(args, list) else args)
        branches = [ref(b["model"]) for b in entry.get("branch_model_dict", [])]
        if not branches:
            raise ReferenceConfigError("empty branch_model_dict")
        if approximations is not None:
            approximations.append(
                (entry.get("id", t), "value->branch coupling relaxed to first_match; tighten with parse_value_branches")
            )
        return P.seq(vm, P.first_match(*branches))
    raise ReferenceConfigError(f"unsupported parser element type {t!r}")


# ---------------------------------------------------------------------------
# Analysis section: match rules
# ---------------------------------------------------------------------------

_RULE_TYPES = {
    "PathExistsMatchRule",
    "ValueMatchRule",
    "ValueListMatchRule",
    "ValueRangeMatchRule",
    "StringRegexMatchRule",
    "NegationMatchRule",
    "AndMatchRule",
    "OrMatchRule",
    "DebugMatchRule",
    "ModuloTimeMatchRule",
}


def _build_rule(entry: dict, rules: dict[str, Column]) -> Column:
    t = entry["type"]

    def sub(rid: str) -> Column:
        if rid not in rules:
            raise ReferenceConfigError(
                f"rule {entry.get('id')!r} references unknown rule {rid!r}"
            )
        return rules[rid]

    if t == "PathExistsMatchRule":
        return R.path_exists(path_col(entry["path"]))
    if t == "ValueMatchRule":
        return R.value_match(path_col(entry["path"]), entry["value"])
    if t == "ValueListMatchRule":
        return R.value_in(path_col(entry["path"]), entry["value_list"])
    if t == "ValueRangeMatchRule":
        return R.value_range(
            path_col(entry["path"]), entry["lower_limit"], entry["upper_limit"]
        )
    if t == "StringRegexMatchRule":
        return R.string_regex(path_col(entry["path"]), entry["regex"])
    if t == "NegationMatchRule":
        return R.not_(sub(entry["sub_rule"]))
    if t == "AndMatchRule":
        return R.and_(*[sub(r) for r in entry["sub_rules"]])
    if t == "OrMatchRule":
        return R.or_(*[sub(r) for r in entry["sub_rules"]])
    if t == "DebugMatchRule":
        # the reference debug rule matches everything and logs; logging is
        # a side effect batch plans don't have — it is the identity rule
        return F.lit(True)
    if t == "ModuloTimeMatchRule":
        return R.modulo_time(
            path_col(entry["path"]),
            int(entry["seconds_modulo"]),
            entry["lower_limit"],
            entry["upper_limit"],
        )
    raise ReferenceConfigError(f"unsupported rule type {t!r}")


# ---------------------------------------------------------------------------
# Analysis section: detectors
# ---------------------------------------------------------------------------

Builder = Callable[[DataFrame], DataFrame]


def _detector_builder(
    entry: dict,
    rules: dict[str, Column],
    ts_col: str | None,
    order_col: str,
) -> Builder:
    t = entry["type"]
    cols = [path_col(p) for p in entry.get("paths", [])]

    if t == "TimestampsUnsortedDetector":
        if ts_col is None:
            raise ReferenceConfigError("needs Input.timestamp_paths for ts column")
        from logdata_anomaly_miner_spark.operators.timestamps import unsorted_timestamps

        def b(df: DataFrame) -> DataFrame:
            us = (F.col(ts_col).cast("double") * 1_000_000).cast("long")
            return unsorted_timestamps(
                df.withColumn("_us", us), ts_col="_us", order_cols=[order_col]
            )

        return b

    if t == "AllowlistViolationDetector":
        allow = [rules[r] for r in entry["allowlist_rules"] if r in rules]
        missing = [r for r in entry["allowlist_rules"] if r not in rules]
        if missing:
            raise ReferenceConfigError(f"unknown allowlist rules {missing}")
        return lambda df: R.allowlist_violations(df, allow)

    if t == "MatchFilter":
        vals = entry.get("value_list")
        conds = [
            R.value_in(c, vals) if vals is not None else R.path_exists(c) for c in cols
        ]
        return lambda df: R.match_filter(df, R.or_(*conds))

    if t in ("NewMatchPathValueDetector", "NewMatchPathValueComboDetector"):
        from logdata_anomaly_miner_spark.operators.new_value import check_new_values

        return lambda df: check_new_values(df, cols, None, order_cols=[order_col])

    if t == "EnhancedNewMatchPathValueComboDetector":
        from logdata_anomaly_miner_spark.operators.new_value import (
            check_new_combos_enhanced,
        )

        if ts_col is None:
            raise ReferenceConfigError("needs Input.timestamp_paths for ts column")
        return lambda df: check_new_combos_enhanced(df, cols, None, ts_col=ts_col)[0]

    if t == "MissingMatchPathValueDetector":
        from logdata_anomaly_miner_spark.operators.missing import check_missing_values

        if ts_col is None:
            raise ReferenceConfigError("needs Input.timestamp_paths for ts column")
        interval = float(entry.get("check_interval", 3600))

        def b(df: DataFrame) -> DataFrame:
            us = (F.col(ts_col).cast("double") * 1_000_000).cast("long")
            return check_missing_values(
                df.withColumn("_us", us), cols, interval, "_us"
            )

        return b

    if t == "ValueRangeDetector":
        from logdata_anomaly_miner_spark.operators.value_range import (
            check_value_range_sequential,
        )

        return lambda df: check_value_range_sequential(
            df, id_cols=cols[:-1], value_col=cols[-1], order_cols=[order_col]
        )[0]

    if t == "EntropyDetector":
        from logdata_anomaly_miner_spark.operators.entropy import (
            check_entropy,
            learn_bigram_freq,
            score_entropy_pandas,
        )

        thresh = float(entry.get("prob_thresh", 0.05))
        col = cols[0]

        def b(df: DataFrame) -> DataFrame:
            src = df.filter(F.col(col).isNotNull())
            freq, _ = learn_bigram_freq(src, col)
            scored = score_entropy_pandas(df.sparkSession, src, col, freq)
            return check_entropy(scored, thresh)

        return b

    if t == "CharsetDetector":
        from logdata_anomaly_miner_spark.operators.charset import (
            check_charset,
            learn_charsets,
        )

        col = cols[0]
        return lambda df: check_charset(df, col, learn_charsets(df, col, []), [])

    if t == "EventSequenceDetector":
        from logdata_anomaly_miner_spark.operators.sequence import check_new_sequences

        ids = [path_col(p) for p in entry.get("id_path_list", [])]
        if not cols and not ids:
            raise ReferenceConfigError("needs paths or id_path_list")
        length = int(entry.get("seq_len", 3))
        value_col = cols[0] if cols else ids[-1]
        return lambda df: check_new_sequences(
            df, value_col, None, n=length,
            id_cols=ids if cols else [], order_cols=[order_col],
        )

    if t == "EventFrequencyDetector":
        from logdata_anomaly_miner_spark.operators.event_frequency import (
            check_event_frequency,
        )

        if ts_col is None or not cols:
            raise ReferenceConfigError(
                "batch analog needs Input.timestamp_paths and paths"
            )
        wsz = float(entry.get("window_size", 600))
        nw = int(entry.get("num_windows", 50))
        cf = float(entry.get("confidence_factor", 0.33))

        return lambda df: check_event_frequency(
            df, cols, wsz, num_windows=nw, confidence_factor=cf, ts_col=ts_col
        )

    if t == "ParserCount":
        from logdata_anomaly_miner_spark.operators.histogram import parser_counts

        return lambda df: parser_counts(df, cols[0] if cols else "kind")

    raise ReferenceConfigError(f"unsupported detector type {t!r}")


# ---------------------------------------------------------------------------
# Top level
# ---------------------------------------------------------------------------

@dataclass
class ReferenceConfig:
    model: P.Element
    elements: dict[str, P.Element]
    rules: dict[str, Column]
    detectors: dict[str, Builder]
    skipped: list[tuple[str, str]] = field(default_factory=list)
    approximations: list[tuple[str, str]] = field(default_factory=list)
    timestamp_col: str | None = None
    order_col: str = "line_no"
    learn_mode: bool | None = None

    def parse(self, df: DataFrame, raw_col: str) -> DataFrame:
        return P.parse(df, raw_col, self.model)

    def run_detectors(self, parsed: DataFrame) -> dict[str, DataFrame]:
        return {did: b(parsed) for did, b in self.detectors.items()}


def load_reference_config(
    src: str | dict,
    *,
    parser_id: str | None = None,
    order_col: str = "line_no",
    strict: bool = False,
) -> ReferenceConfig:
    """``src``: path to a reference config.yml, a YAML string, or the
    already-parsed mapping. ``order_col``: ingest-order column of the raw
    DataFrame (the atom sequence number)."""
    if isinstance(src, dict):
        data = src
    else:
        import yaml

        text = src
        if "\n" not in src and not src.lstrip().startswith(("{", "Parser")):
            with open(src) as f:
                text = f.read()
        data = yaml.safe_load(text)
    if not isinstance(data, dict) or "Parser" not in data:
        raise ReferenceConfigError("not a reference config: no Parser section")

    elements: dict[str, P.Element] = {}
    skipped: list[tuple[str, str]] = []
    approximations: list[tuple[str, str]] = []
    used_names: dict[str, int] = {}
    ref_counts: dict[str, int] = {}
    for entry in data["Parser"]:
        # Reference models freely reuse element NAMES across branches (the
        # match tree keys by full path); one compiled regex cannot repeat a
        # group name, so reused names get a numeric suffix (User, User2 …).
        nm = entry.get("name")
        if nm is not None and entry.get("type") != "FixedDataModelElement":
            base = _sanitize(str(nm))
            k = used_names.get(base, 0) + 1
            used_names[base] = k
            if k > 1:
                entry = {**entry, "name": f"{base}{k}"}
        try:
            elements[entry["id"]] = _build_element(
                entry, elements, approximations, ref_counts
            )
        except ReferenceConfigError as e:
            if strict:
                raise
            skipped.append((entry.get("id", entry.get("type", "?")), str(e)))

    root = parser_id
    if root is None:
        res = data.get("LogResourceList") or []
        if res and isinstance(res[0], dict):
            root = res[0].get("parser_id")
    if root is None and data["Parser"]:
        root = data["Parser"][-1]["id"]
    if root not in elements:
        raise ReferenceConfigError(
            f"root parser id {root!r} not found/built; skipped elements: {skipped}"
        )

    ts_paths = (data.get("Input") or {}).get("timestamp_paths") or []
    ts_col = path_col(ts_paths[0]) if ts_paths else None

    rules: dict[str, Column] = {}
    detectors: dict[str, Builder] = {}
    for entry in data.get("Analysis") or []:
        t = entry.get("type", "?")
        eid = entry.get("id", t)
        try:
            if t in _RULE_TYPES:
                rules[eid] = _build_rule(entry, rules)
            else:
                detectors[eid] = _detector_builder(entry, rules, ts_col, order_col)
        except ReferenceConfigError as e:
            if strict:
                raise
            skipped.append((eid, str(e)))

    return ReferenceConfig(
        model=elements[root],
        elements=elements,
        rules=rules,
        detectors=detectors,
        skipped=skipped,
        approximations=approximations,
        timestamp_col=ts_col,
        order_col=order_col,
        learn_mode=data.get("LearnMode"),
    )
