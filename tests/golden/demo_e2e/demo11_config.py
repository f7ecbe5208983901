"""Eleventh deterministic parity pipeline — EntropyDetector (round-5
VERDICT item 1: the only north-star detector without a reference-emitted
golden).

Consumed only by scripts/capture_demo_golden.py (see ref_config.py for the
harness contract). Exercises the check-then-learn interleaving of
EntropyDetector (aminer/analysis/EntropyDetector.py:87-193) twice over the
same stream: once plain and once with skip_repetitions=True, so the golden
certifies both the per-atom prefix-frequency scoring ("Value entropy
anomaly detected" rendering, format per T/unit/analysis/EntropyDetectorTest)
and the value-dedup learning variant, whose scores diverge as soon as a
value repeats.
"""

config_properties = {
    "LogResourceList": ["file:///tmp/parity_syslog11"],
    "AminerUser": "aminer",
    "AminerGroup": "aminer",
    "Core.PersistenceDir": "/tmp/parity_persistence11",
    "LogPrefix": "Original log line: ",
}


def build_analysis_pipeline(analysis_context):
    """Build the EntropyDetector parity pipeline (reference config API)."""
    from aminer.analysis import AtomFilters
    from aminer.analysis.EntropyDetector import EntropyDetector
    from aminer.analysis.NewMatchPathDetector import NewMatchPathDetector
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
    analysis_context.register_component(unparsed, component_name="Unparsed11")

    nmpd = NewMatchPathDetector(
        analysis_context.aminer_config, handlers, learn_mode=True
    )
    atom_filter.add_handler(nmpd)
    analysis_context.register_component(nmpd, component_name="NewPath11")

    entropy = EntropyDetector(
        analysis_context.aminer_config, handlers,
        target_path_list=["/Sess/name"], prob_thresh=0.05,
        learn_mode=True, output_logline=False,
    )
    atom_filter.add_handler(entropy)
    analysis_context.register_component(entropy, component_name="NameEntropy")

    entropy_skip = EntropyDetector(
        analysis_context.aminer_config, handlers,
        target_path_list=["/Sess/name"], prob_thresh=0.05,
        skip_repetitions=True, learn_mode=True, output_logline=False,
        persistence_id="skip",
    )
    atom_filter.add_handler(entropy_skip)
    analysis_context.register_component(entropy_skip, component_name="NameEntropySkip")
