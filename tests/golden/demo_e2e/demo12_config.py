"""Twelfth deterministic parity pipeline — PCADetector (round-5 VERDICT
item 1, second half: numpy-only detector with no reference-emitted golden).

Consumed only by scripts/capture_demo_golden.py. Exercises the sliding
event-count-window PCA loop (aminer/analysis/PCADetector.py:94-260): counts
of /S12/svc values per 10-s window, FIFO matrix of 5 windows, PCA recomputed
per learned window, and the rollover-time anomaly score (reconstruction
error scaled by the training losses' min/max) emitted on the first atom of
the following window. The corpus holds six stable windows, one 20:1 spike
window, and a normal tail so exactly the spike scores above
min_anomaly_score — certifying the reference's idiosyncratic reconstruction
slicing (ascending-eigenvalue column order) byte-for-byte.
"""

config_properties = {
    "LogResourceList": ["file:///tmp/parity_syslog12"],
    "AminerUser": "aminer",
    "AminerGroup": "aminer",
    "Core.PersistenceDir": "/tmp/parity_persistence12",
    "LogPrefix": "Original log line: ",
}


def build_analysis_pipeline(analysis_context):
    """Build the PCADetector parity pipeline (reference config API)."""
    from aminer.analysis import AtomFilters
    from aminer.analysis.NewMatchPathDetector import NewMatchPathDetector
    from aminer.analysis.PCADetector import PCADetector
    from aminer.analysis.UnparsedAtomHandlers import SimpleUnparsedAtomHandler
    from aminer.events.StreamPrinterEventHandler import StreamPrinterEventHandler
    from aminer.input.SimpleByteStreamLineAtomizerFactory import (
        SimpleByteStreamLineAtomizerFactory,
    )
    from aminer.parsing.AnyByteDataModelElement import AnyByteDataModelElement
    from aminer.parsing.DateTimeModelElement import DateTimeModelElement
    from aminer.parsing.FixedDataModelElement import FixedDataModelElement
    from aminer.parsing.SequenceModelElement import SequenceModelElement

    parsing_model = SequenceModelElement("S12", [
        DateTimeModelElement("DTM", b"%Y-%m-%d %H:%M:%S"),
        FixedDataModelElement("Fix", b" svc "),
        AnyByteDataModelElement("svc"),
    ])

    atom_filter = AtomFilters.SubhandlerFilter(None)
    printer = StreamPrinterEventHandler(analysis_context)
    handlers = [printer]
    analysis_context.atomizer_factory = SimpleByteStreamLineAtomizerFactory(
        parsing_model, [atom_filter], handlers,
        default_timestamp_path_list=["/S12/DTM"],
        use_real_time=True,
    )

    unparsed = SimpleUnparsedAtomHandler(handlers)
    atom_filter.add_handler(unparsed, stop_when_handled_flag=True)
    analysis_context.register_component(unparsed, component_name="Unparsed12")

    nmpd = NewMatchPathDetector(
        analysis_context.aminer_config, handlers, learn_mode=True
    )
    atom_filter.add_handler(nmpd)
    analysis_context.register_component(nmpd, component_name="NewPath12")

    pca = PCADetector(
        analysis_context.aminer_config, ["/S12/svc"], handlers,
        window_size=10.0, min_anomaly_score=2.0, min_variance=0.9,
        num_windows=5, learn_mode=True, output_logline=False,
    )
    atom_filter.add_handler(pca)
    analysis_context.register_component(pca, component_name="SvcPCA")
