"""Thirteenth deterministic parity pipeline — TimeCorrelationDetector with
a pinned random seed (round-5 VERDICT item 3: the feature mining uses the
stdlib ``random`` module, TimeCorrelationDetector.py:97-130; seeding makes
the sampled rule set — and therefore the periodic correlation reports —
a stable golden).

Consumed only by scripts/capture_demo_golden.py. The Spark replay
(tests/test_demo_e2e_parity.py pipeline 13) re-executes the identical
stdlib random call sequence under the same seed to obtain the same mined
rules, evaluates them as Column predicates, and reproduces the pair
count/delta tables with prefix windows.
"""

config_properties = {
    "LogResourceList": ["file:///tmp/parity_syslog13"],
    "AminerUser": "aminer",
    "AminerGroup": "aminer",
    "Core.PersistenceDir": "/tmp/parity_persistence13",
    "LogPrefix": "Original log line: ",
}

RANDOM_SEED = 42


def build_analysis_pipeline(analysis_context):
    """Build the TimeCorrelationDetector parity pipeline."""
    import random

    from aminer.analysis import AtomFilters
    from aminer.analysis.NewMatchPathDetector import NewMatchPathDetector
    from aminer.analysis.TimeCorrelationDetector import TimeCorrelationDetector
    from aminer.analysis.UnparsedAtomHandlers import SimpleUnparsedAtomHandler
    from aminer.events.StreamPrinterEventHandler import StreamPrinterEventHandler
    from aminer.input.SimpleByteStreamLineAtomizerFactory import (
        SimpleByteStreamLineAtomizerFactory,
    )
    from aminer.parsing.DateTimeModelElement import DateTimeModelElement
    from aminer.parsing.DelimitedDataModelElement import DelimitedDataModelElement
    from aminer.parsing.FixedDataModelElement import FixedDataModelElement
    from aminer.parsing.FixedWordlistDataModelElement import (
        FixedWordlistDataModelElement,
    )
    from aminer.parsing.SequenceModelElement import SequenceModelElement

    random.seed(RANDOM_SEED)

    parsing_model = SequenceModelElement("Sess", [
        DateTimeModelElement("DTM", b"%Y-%m-%d %H:%M:%S"),
        FixedDataModelElement("Fix", b" user "),
        DelimitedDataModelElement("name", b" "),
        FixedDataModelElement("Sp", b" "),
        FixedWordlistDataModelElement("action", [b"login", b"logout"]),
    ])

    atom_filter = AtomFilters.SubhandlerFilter(None)
    printer = StreamPrinterEventHandler(analysis_context)
    handlers = [printer]
    analysis_context.atomizer_factory = SimpleByteStreamLineAtomizerFactory(
        parsing_model, [atom_filter], handlers,
        default_timestamp_path_list=["/Sess/DTM"],
        use_real_time=True,
    )

    unparsed = SimpleUnparsedAtomHandler(handlers)
    atom_filter.add_handler(unparsed, stop_when_handled_flag=True)
    analysis_context.register_component(unparsed, component_name="Unparsed13")

    nmpd = NewMatchPathDetector(
        analysis_context.aminer_config, handlers, learn_mode=True
    )
    atom_filter.add_handler(nmpd)
    analysis_context.register_component(nmpd, component_name="NewPath13")

    tcd = TimeCorrelationDetector(
        analysis_context.aminer_config, handlers, parallel_check_count=3,
        record_count_before_event=30, min_rule_attributes=1,
        max_rule_attributes=2,
    )
    atom_filter.add_handler(tcd)
    analysis_context.register_component(tcd, component_name="TimeCorr13")
