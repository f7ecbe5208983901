"""Sixth deterministic parity pipeline — cross-row assembly + count clusters
+ statistical bins.

Consumed only by scripts/capture_demo_golden.py (see ref_config.py for the
harness contract). Exercises NewMatchIdValueComboDetector (combos assembled
ACROSS rows sharing an id), EventCountClusterDetector (per-id window count
vectors vs a learned model, manhattan score) and
MatchValueAverageChangeDetector (element/time bins, avg/var change test)
over a two-family service event stream.
"""

config_properties = {
    "LogResourceList": ["file:///tmp/parity_syslog6"],
    "AminerUser": "aminer",
    "AminerGroup": "aminer",
    "Core.PersistenceDir": "/tmp/parity_persistence6",
    "LogPrefix": "Original log line: ",
}


def build_analysis_pipeline(analysis_context):
    """Build the sixth parity pipeline (reference config API)."""
    from aminer.analysis import AtomFilters
    from aminer.analysis.EventCountClusterDetector import EventCountClusterDetector
    from aminer.analysis.MatchValueAverageChangeDetector import (
        MatchValueAverageChangeDetector,
    )
    from aminer.analysis.NewMatchIdValueComboDetector import (
        NewMatchIdValueComboDetector,
    )
    from aminer.analysis.NewMatchPathDetector import NewMatchPathDetector
    from aminer.analysis.UnparsedAtomHandlers import SimpleUnparsedAtomHandler
    from aminer.events.StreamPrinterEventHandler import StreamPrinterEventHandler
    from aminer.input.SimpleByteStreamLineAtomizerFactory import (
        SimpleByteStreamLineAtomizerFactory,
    )
    from aminer.parsing.DateTimeModelElement import DateTimeModelElement
    from aminer.parsing.DecimalIntegerValueModelElement import (
        DecimalIntegerValueModelElement,
    )
    from aminer.parsing.DelimitedDataModelElement import DelimitedDataModelElement
    from aminer.parsing.FirstMatchModelElement import FirstMatchModelElement
    from aminer.parsing.FixedDataModelElement import FixedDataModelElement
    from aminer.parsing.FixedWordlistDataModelElement import (
        FixedWordlistDataModelElement,
    )
    from aminer.parsing.SequenceModelElement import SequenceModelElement

    # svc parses under ONE shared path (a branch per variant would give
    # family-specific id paths, which trips a reference defect: ECCD's
    # allow_missing_id is read in receive_atom but never initialized)
    parsing_model = SequenceModelElement("model6", [
        DateTimeModelElement("DTM", b"%Y-%m-%d %H:%M:%S"),
        FixedDataModelElement("Fix", b" svc "),
        DelimitedDataModelElement("svc", b" "),
        FirstMatchModelElement("kind", [
            SequenceModelElement("A", [
                FixedDataModelElement("Sp", b" ev "),
                FixedWordlistDataModelElement("ev", [b"login", b"logout", b"error"]),
            ]),
            SequenceModelElement("B", [
                FixedDataModelElement("Sp", b" val "),
                DecimalIntegerValueModelElement("val"),
            ]),
        ]),
    ])

    atom_filter = AtomFilters.SubhandlerFilter(None)
    printer = StreamPrinterEventHandler(analysis_context)
    handlers = [printer]
    analysis_context.atomizer_factory = SimpleByteStreamLineAtomizerFactory(
        parsing_model, [atom_filter], handlers,
        default_timestamp_path_list=["/model6/DTM"],
        use_real_time=True,
    )

    unparsed = SimpleUnparsedAtomHandler(handlers)
    atom_filter.add_handler(unparsed, stop_when_handled_flag=True)
    analysis_context.register_component(unparsed, component_name="Unparsed6")

    nmpd = NewMatchPathDetector(
        analysis_context.aminer_config, handlers, learn_mode=True
    )
    atom_filter.add_handler(nmpd)
    analysis_context.register_component(nmpd, component_name="NewPath6")

    idcombo = NewMatchIdValueComboDetector(
        analysis_context.aminer_config,
        ["/model6/kind/A/ev", "/model6/kind/B/val"], handlers,
        id_path_list=["/model6/svc"],
        min_allowed_time_diff=60, learn_mode=True, output_logline=False,
    )
    atom_filter.add_handler(idcombo)
    analysis_context.register_component(idcombo, component_name="SvcCombo")

    cluster = EventCountClusterDetector(
        analysis_context.aminer_config, handlers,
        window_size=10, id_path_list=["/model6/svc"],
        num_windows=50, confidence_factor=0.33, check_empty_windows=True,
        learn_mode=True, output_logline=False,
    )
    atom_filter.add_handler(cluster)
    analysis_context.register_component(cluster, component_name="SvcCluster")

    avg = MatchValueAverageChangeDetector(
        analysis_context.aminer_config, handlers, "/model6/DTM",
        ["/model6/kind/B/val"], min_bin_elements=3, min_bin_time=10,
        avg_factor=1, var_factor=2, learn_mode=True, output_logline=False,
    )
    atom_filter.add_handler(avg)
    analysis_context.register_component(avg, component_name="ValAvg")
