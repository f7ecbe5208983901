"""Ninth deterministic parity pipeline — path-dependent histograms +
modulo-time bins.

Consumed only by scripts/capture_demo_golden.py (see ref_config.py for the
harness contract). Exercises HistogramAnalysis with ModuloTimeBinDefinition
(hour-of-day bins, the demo-config.yml shape) over a branch-tailed value
model. PathDependentHistogramAnalysis is deliberately NOT replayed: its
receive_atom re-reads the match value from the LAST set-iteration path of
the histogram mapping (HistogramAnalysis.py:~512-526), which is
PYTHONHASHSEED-dependent — the reference's own output is not reproducible
across processes, so there is no stable golden to match.
"""

config_properties = {
    "LogResourceList": ["file:///tmp/parity_syslog9"],
    "AminerUser": "aminer",
    "AminerGroup": "aminer",
    "Core.PersistenceDir": "/tmp/parity_persistence9",
    "LogPrefix": "Original log line: ",
}


def build_analysis_pipeline(analysis_context):
    """Build the ninth parity pipeline (reference config API)."""
    from aminer.analysis import AtomFilters
    from aminer.analysis.HistogramAnalysis import (
        HistogramAnalysis,
        ModuloTimeBinDefinition,
    )
    from aminer.analysis.NewMatchPathDetector import NewMatchPathDetector
    from aminer.analysis.UnparsedAtomHandlers import SimpleUnparsedAtomHandler
    from aminer.events.StreamPrinterEventHandler import StreamPrinterEventHandler
    from aminer.input.SimpleByteStreamLineAtomizerFactory import (
        SimpleByteStreamLineAtomizerFactory,
    )
    from aminer.parsing.DateTimeModelElement import DateTimeModelElement
    from aminer.parsing.DecimalFloatValueModelElement import (
        DecimalFloatValueModelElement,
    )
    from aminer.parsing.FirstMatchModelElement import FirstMatchModelElement
    from aminer.parsing.FixedDataModelElement import FixedDataModelElement
    from aminer.parsing.SequenceModelElement import SequenceModelElement

    parsing_model = SequenceModelElement("model9", [
        DateTimeModelElement("DTM", b"%Y-%m-%d %H:%M:%S"),
        FixedDataModelElement("Fix", b" VAL "),
        DecimalFloatValueModelElement("value"),
        FirstMatchModelElement("tail", [
            SequenceModelElement("A", [FixedDataModelElement("ok", b" ok")]),
            SequenceModelElement("B", [FixedDataModelElement("err", b" err")]),
        ]),
    ])

    atom_filter = AtomFilters.SubhandlerFilter(None)
    printer = StreamPrinterEventHandler(analysis_context)
    handlers = [printer]
    analysis_context.atomizer_factory = SimpleByteStreamLineAtomizerFactory(
        parsing_model, [atom_filter], handlers,
        default_timestamp_path_list=["/model9/DTM"],
        use_real_time=True,
    )

    unparsed = SimpleUnparsedAtomHandler(handlers)
    atom_filter.add_handler(unparsed, stop_when_handled_flag=True)
    analysis_context.register_component(unparsed, component_name="Unparsed9")

    nmpd = NewMatchPathDetector(
        analysis_context.aminer_config, handlers, learn_mode=True
    )
    atom_filter.add_handler(nmpd)
    analysis_context.register_component(nmpd, component_name="NewPath9")

    hour_hist = HistogramAnalysis(
        analysis_context.aminer_config,
        [("/model9/DTM", ModuloTimeBinDefinition(86400, 3600, 0, 1, 24))],
        20, handlers, reset_after_report_flag=True,
    )
    atom_filter.add_handler(hour_hist)
    analysis_context.register_component(hour_hist, component_name="HourHist")
