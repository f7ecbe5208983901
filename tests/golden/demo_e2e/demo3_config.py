"""Third deterministic parity pipeline — stateful window/sequence families.

Consumed only by scripts/capture_demo_golden.py (see ref_config.py for the
harness contract). Exercises EventSequenceDetector (per-id 2-gram novelty),
MissingMatchPathValueDetector (overdue learned values, atom-time driven)
and EventFrequencyDetector (window counts vs confidence band, empty-window
warnings) over an action-session line family with parsed timestamps.
"""

config_properties = {
    "LogResourceList": ["file:///tmp/parity_syslog3"],
    "AminerUser": "aminer",
    "AminerGroup": "aminer",
    "Core.PersistenceDir": "/tmp/parity_persistence3",
    "LogPrefix": "Original log line: ",
}


def build_analysis_pipeline(analysis_context):
    """Build the third parity pipeline (reference config API)."""
    from aminer.analysis import AtomFilters
    from aminer.analysis.EventFrequencyDetector import EventFrequencyDetector
    from aminer.analysis.EventSequenceDetector import EventSequenceDetector
    from aminer.analysis.MissingMatchPathValueDetector import (
        MissingMatchPathValueDetector,
    )
    from aminer.analysis.NewMatchPathDetector import NewMatchPathDetector
    from aminer.analysis.UnparsedAtomHandlers import SimpleUnparsedAtomHandler
    from aminer.events.StreamPrinterEventHandler import StreamPrinterEventHandler
    from aminer.input.SimpleByteStreamLineAtomizerFactory import (
        SimpleByteStreamLineAtomizerFactory,
    )
    from aminer.parsing.DateTimeModelElement import DateTimeModelElement
    from aminer.parsing.DelimitedDataModelElement import DelimitedDataModelElement
    from aminer.parsing.FirstMatchModelElement import FirstMatchModelElement
    from aminer.parsing.FixedDataModelElement import FixedDataModelElement
    from aminer.parsing.FixedWordlistDataModelElement import (
        FixedWordlistDataModelElement,
    )
    from aminer.parsing.SequenceModelElement import SequenceModelElement

    parsing_model = FirstMatchModelElement("model3", [
        SequenceModelElement("Act", [
            DateTimeModelElement("DTM", b"%Y-%m-%d %H:%M:%S"),
            FixedDataModelElement("Fix", b" id "),
            DelimitedDataModelElement("sid", b" "),
            FixedDataModelElement("Sp", b" act "),
            FixedWordlistDataModelElement("act", [b"open", b"read", b"close", b"write"]),
        ]),
    ])

    atom_filter = AtomFilters.SubhandlerFilter(None)
    printer = StreamPrinterEventHandler(analysis_context)
    handlers = [printer]
    analysis_context.atomizer_factory = SimpleByteStreamLineAtomizerFactory(
        parsing_model, [atom_filter], handlers,
        default_timestamp_path_list=["/model3/Act/DTM"],
        use_real_time=True,
    )

    unparsed = SimpleUnparsedAtomHandler(handlers)
    atom_filter.add_handler(unparsed, stop_when_handled_flag=True)
    analysis_context.register_component(unparsed, component_name="Unparsed3")

    nmpd = NewMatchPathDetector(
        analysis_context.aminer_config, handlers, learn_mode=True
    )
    atom_filter.add_handler(nmpd)
    analysis_context.register_component(nmpd, component_name="NewPath3")

    esd = EventSequenceDetector(
        analysis_context.aminer_config, handlers,
        id_path_list=["/model3/Act/sid"], target_path_list=["/model3/Act/act"],
        seq_len=2, learn_mode=True, output_logline=False,
    )
    atom_filter.add_handler(esd)
    analysis_context.register_component(esd, component_name="ActSeq")

    missing = MissingMatchPathValueDetector(
        analysis_context.aminer_config, ["/model3/Act/sid"], handlers,
        learn_mode=True, default_interval=15, realert_interval=1000,
        output_logline=False,
    )
    atom_filter.add_handler(missing)
    analysis_context.register_component(missing, component_name="MissingSid")

    freq = EventFrequencyDetector(
        analysis_context.aminer_config, handlers,
        window_size=10, confidence_factor=0.5, empty_window_warnings=True,
        learn_mode=True, output_logline=False,
    )
    atom_filter.add_handler(freq)
    analysis_context.register_component(freq, component_name="ActFreq")
