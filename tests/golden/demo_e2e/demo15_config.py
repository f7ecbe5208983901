"""Fifteenth deterministic parity pipeline — PathDependentHistogramAnalysis
(round-5 VERDICT item 4).

Captured in a PYTHONHASHSEED=0 subprocess (scripts/capture_demo_golden.py
pins the seed for this entry). Scope note, established empirically during
round 6: a MULTI-path parser model cannot produce a stable golden from the
reference at any hash seed — receive_atom's mapped branch
(aminer/analysis/HistogramAnalysis.py:520-527) re-reads ``match_value``
from the LAST set-iterated mapped_path instead of the configured
target_path, so whenever iteration order lands on a bytes-valued path
(sequence root, FixedDataModelElement) or an out-of-range int (epoch),
``get_bin`` raises TypeError — probed over 7 element-name/outlier-flag
combinations under PYTHONHASHSEED=0, all crash. The single-path model below
(bare DateTimeModelElement, ModuloTime hour bins) keeps every set a
singleton, exercising the detector's mapped-add flow, report cadence,
rendering, and reset_after_report byte-for-byte.
"""

config_properties = {
    "LogResourceList": ["file:///tmp/parity_syslog15"],
    "AminerUser": "aminer",
    "AminerGroup": "aminer",
    "Core.PersistenceDir": "/tmp/parity_persistence15",
    "LogPrefix": "Original log line: ",
}


def build_analysis_pipeline(analysis_context):
    """Build the PathDependentHistogramAnalysis parity pipeline."""
    from aminer.analysis import AtomFilters
    from aminer.analysis.HistogramAnalysis import (
        ModuloTimeBinDefinition,
        PathDependentHistogramAnalysis,
    )
    from aminer.analysis.NewMatchPathDetector import NewMatchPathDetector
    from aminer.analysis.UnparsedAtomHandlers import SimpleUnparsedAtomHandler
    from aminer.events.StreamPrinterEventHandler import StreamPrinterEventHandler
    from aminer.input.SimpleByteStreamLineAtomizerFactory import (
        SimpleByteStreamLineAtomizerFactory,
    )
    from aminer.parsing.DateTimeModelElement import DateTimeModelElement

    parsing_model = DateTimeModelElement("t", b"%Y-%m-%d %H:%M:%S")

    atom_filter = AtomFilters.SubhandlerFilter(None)
    printer = StreamPrinterEventHandler(analysis_context)
    handlers = [printer]
    analysis_context.atomizer_factory = SimpleByteStreamLineAtomizerFactory(
        parsing_model, [atom_filter], handlers,
        default_timestamp_path_list=["/t"],
        use_real_time=True,
    )

    unparsed = SimpleUnparsedAtomHandler(handlers)
    atom_filter.add_handler(unparsed, stop_when_handled_flag=True)
    analysis_context.register_component(unparsed, component_name="Unparsed15")

    nmpd = NewMatchPathDetector(
        analysis_context.aminer_config, handlers, learn_mode=True
    )
    atom_filter.add_handler(nmpd)
    analysis_context.register_component(nmpd, component_name="NewPath15")

    pdh = PathDependentHistogramAnalysis(
        analysis_context.aminer_config, "/t",
        ModuloTimeBinDefinition(86400, 3600, 0, 1, 24), 3600, handlers,
        reset_after_report_flag=True,
    )
    atom_filter.add_handler(pdh)
    analysis_context.register_component(pdh, component_name="PathHist15")
