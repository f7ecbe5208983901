"""Second deterministic parity pipeline — richer detector families.

Consumed only by scripts/capture_demo_golden.py (see ref_config.py for the
harness contract). Exercises MatchFilter, ValueRangeDetector,
CharsetDetector, EnhancedNewMatchPathValueComboDetector and
HistogramAnalysis (LinearNumericBinDefinition, atom-time report trigger)
over typed VAL / user line families with parsed timestamps.
"""

config_properties = {
    "LogResourceList": ["file:///tmp/parity_syslog2"],
    "AminerUser": "aminer",
    "AminerGroup": "aminer",
    "Core.PersistenceDir": "/tmp/parity_persistence2",
    "LogPrefix": "Original log line: ",
}


def build_analysis_pipeline(analysis_context):
    """Build the second parity pipeline (reference config API)."""
    from aminer.analysis import AtomFilters
    from aminer.analysis.CharsetDetector import CharsetDetector
    from aminer.analysis.EnhancedNewMatchPathValueComboDetector import (
        EnhancedNewMatchPathValueComboDetector,
    )
    from aminer.analysis.HistogramAnalysis import (
        HistogramAnalysis,
        LinearNumericBinDefinition,
    )
    from aminer.analysis.MatchFilter import MatchFilter
    from aminer.analysis.UnparsedAtomHandlers import SimpleUnparsedAtomHandler
    from aminer.analysis.ValueRangeDetector import ValueRangeDetector
    from aminer.events.StreamPrinterEventHandler import StreamPrinterEventHandler
    from aminer.input.SimpleByteStreamLineAtomizerFactory import (
        SimpleByteStreamLineAtomizerFactory,
    )
    from aminer.parsing.DateTimeModelElement import DateTimeModelElement
    from aminer.parsing.DecimalFloatValueModelElement import (
        DecimalFloatValueModelElement,
    )
    from aminer.parsing.DelimitedDataModelElement import DelimitedDataModelElement
    from aminer.parsing.FirstMatchModelElement import FirstMatchModelElement
    from aminer.parsing.FixedDataModelElement import FixedDataModelElement
    from aminer.parsing.FixedWordlistDataModelElement import (
        FixedWordlistDataModelElement,
    )
    from aminer.parsing.SequenceModelElement import SequenceModelElement

    parsing_model = FirstMatchModelElement("model2", [
        SequenceModelElement("Val", [
            DateTimeModelElement("DTM", b"%Y-%m-%d %H:%M:%S"),
            FixedDataModelElement("Fix", b" VAL "),
            DecimalFloatValueModelElement("value"),
        ]),
        SequenceModelElement("User", [
            DateTimeModelElement("DTM", b"%Y-%m-%d %H:%M:%S"),
            FixedDataModelElement("Fix", b" user "),
            DelimitedDataModelElement("name", b" "),
            FixedDataModelElement("Sp", b" "),
            FixedWordlistDataModelElement("action", [b"login", b"logout"]),
        ]),
    ])

    atom_filter = AtomFilters.SubhandlerFilter(None)
    printer = StreamPrinterEventHandler(analysis_context)
    handlers = [printer]
    analysis_context.atomizer_factory = SimpleByteStreamLineAtomizerFactory(
        parsing_model, [atom_filter], handlers,
        default_timestamp_path_list=["/model2/Val/DTM", "/model2/User/DTM"],
        use_real_time=True,
    )

    unparsed = SimpleUnparsedAtomHandler(handlers)
    atom_filter.add_handler(unparsed, stop_when_handled_flag=True)
    analysis_context.register_component(unparsed, component_name="Unparsed2")

    # every reference demo config carries NewMatchPathDetector; it is also
    # the handler whose True return marks parsed atoms consumed (the other
    # detectors here return None)
    from aminer.analysis.NewMatchPathDetector import NewMatchPathDetector

    nmpd = NewMatchPathDetector(
        analysis_context.aminer_config, handlers, learn_mode=True
    )
    atom_filter.add_handler(nmpd)
    analysis_context.register_component(nmpd, component_name="NewPath2")

    match_filter = MatchFilter(
        analysis_context.aminer_config, ["/model2/Val/value"], handlers,
        target_value_list=[42.0],
    )
    atom_filter.add_handler(match_filter)
    analysis_context.register_component(match_filter, component_name="ValFilter")

    value_range = ValueRangeDetector(
        analysis_context.aminer_config, handlers, id_path_list=[],
        target_path_list=["/model2/Val/value"], learn_mode=True,
        output_logline=False,
    )
    atom_filter.add_handler(value_range)
    analysis_context.register_component(value_range, component_name="ValRange")

    charset = CharsetDetector(
        analysis_context.aminer_config, handlers, id_path_list=[],
        target_path_list=["/model2/User/name"], learn_mode=True,
        output_logline=False,
    )
    atom_filter.add_handler(charset)
    analysis_context.register_component(charset, component_name="NameCharset")

    combo = EnhancedNewMatchPathValueComboDetector(
        analysis_context.aminer_config,
        ["/model2/User/name", "/model2/User/action"], handlers, learn_mode=True,
    )
    atom_filter.add_handler(combo)
    analysis_context.register_component(combo, component_name="UserAction")

    histogram = HistogramAnalysis(
        analysis_context.aminer_config,
        [("/model2/Val/value", LinearNumericBinDefinition(0, 10, 10))],
        20, handlers, reset_after_report_flag=True,
    )
    atom_filter.add_handler(histogram)
    analysis_context.register_component(histogram, component_name="ValHist")
