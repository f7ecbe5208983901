"""Fourth deterministic parity pipeline — rules + interval/transition/sliding.

Consumed only by scripts/capture_demo_golden.py (see ref_config.py for the
harness contract). Exercises AllowlistViolationDetector (ValueMatchRule
allowlist), PathValueTimeIntervalDetector (appearance times modulo a short
period), MinimalTransitionTimeDetector (per-id pair transition minima) and
SlidingEventFrequencyDetector (occurrences in a trailing time window) over
a transaction line family with parsed timestamps.
"""

config_properties = {
    "LogResourceList": ["file:///tmp/parity_syslog4"],
    "AminerUser": "aminer",
    "AminerGroup": "aminer",
    "Core.PersistenceDir": "/tmp/parity_persistence4",
    "LogPrefix": "Original log line: ",
}


def build_analysis_pipeline(analysis_context):
    """Build the fourth parity pipeline (reference config API)."""
    from aminer.analysis import AtomFilters, Rules
    from aminer.analysis.AllowlistViolationDetector import AllowlistViolationDetector
    from aminer.analysis.MinimalTransitionTimeDetector import (
        MinimalTransitionTimeDetector,
    )
    from aminer.analysis.NewMatchPathDetector import NewMatchPathDetector
    from aminer.analysis.PathValueTimeIntervalDetector import (
        PathValueTimeIntervalDetector,
    )
    from aminer.analysis.SlidingEventFrequencyDetector import (
        SlidingEventFrequencyDetector,
    )
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

    parsing_model = FirstMatchModelElement("model4", [
        SequenceModelElement("Tx", [
            DateTimeModelElement("DTM", b"%Y-%m-%d %H:%M:%S"),
            FixedDataModelElement("Fix", b" tx "),
            DelimitedDataModelElement("txid", b" "),
            FixedDataModelElement("Sp", b" phase "),
            FixedWordlistDataModelElement("phase", [b"start", b"mid", b"end"]),
        ]),
    ])

    atom_filter = AtomFilters.SubhandlerFilter(None)
    printer = StreamPrinterEventHandler(analysis_context)
    handlers = [printer]
    analysis_context.atomizer_factory = SimpleByteStreamLineAtomizerFactory(
        parsing_model, [atom_filter], handlers,
        default_timestamp_path_list=["/model4/Tx/DTM"],
        use_real_time=True,
    )

    unparsed = SimpleUnparsedAtomHandler(handlers)
    atom_filter.add_handler(unparsed, stop_when_handled_flag=True)
    analysis_context.register_component(unparsed, component_name="Unparsed4")

    nmpd = NewMatchPathDetector(
        analysis_context.aminer_config, handlers, learn_mode=True
    )
    atom_filter.add_handler(nmpd)
    analysis_context.register_component(nmpd, component_name="NewPath4")

    allow = AllowlistViolationDetector(
        analysis_context.aminer_config,
        [
            Rules.ValueMatchRule("/model4/Tx/phase", 0),
            Rules.ValueMatchRule("/model4/Tx/phase", 1),
        ],
        handlers, output_logline=False,
    )
    atom_filter.add_handler(allow)
    analysis_context.register_component(allow, component_name="TxAllow")

    interval = PathValueTimeIntervalDetector(
        analysis_context.aminer_config, handlers, ["/model4/Tx/txid"],
        learn_mode=True, time_period_length=120, max_time_diff=10,
        output_logline=False,
    )
    atom_filter.add_handler(interval)
    analysis_context.register_component(interval, component_name="TxInterval")

    transit = MinimalTransitionTimeDetector(
        analysis_context.aminer_config, handlers, ["/model4/Tx/phase"],
        id_path_list=["/model4/Tx/txid"], num_log_lines_solidify_matrix=1000,
        time_output_threshold=0, anomaly_threshold=0.05,
        learn_mode=True, output_logline=False,
    )
    atom_filter.add_handler(transit)
    analysis_context.register_component(transit, component_name="TxTransit")

    slide = SlidingEventFrequencyDetector(
        analysis_context.aminer_config, handlers, set_upper_limit=3,
        window_size=20, learn_mode=True, output_logline=False,
    )
    atom_filter.add_handler(slide)
    analysis_context.register_component(slide, component_name="TxSlide")
