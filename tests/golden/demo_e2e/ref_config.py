"""Deterministic aminer config for the end-to-end parity harness.

This file is an aminer configuration (the reference's public config API,
like aecid-testsuite/integration/config.py defines one) consumed ONLY by
scripts/capture_demo_golden.py, which loads it with the REFERENCE's own
AminerConfig.load_config + AnalysisChild.AnalysisContext to produce the
golden event stream in tests/golden/demo_e2e/reference_stream.txt. It is
NOT part of the Spark engine; the Spark side replays the equivalent
pipeline in tests/test_demo_e2e_parity.py.

Components (all importable without scipy/statsmodels):
SimpleUnparsedAtomHandler, TimestampsUnsortedDetector, NewMatchPathDetector,
NewMatchPathValueDetector, NewMatchPathValueComboDetector — over the
integration test's DiskUpgrade/HomePath parser model shape
(aecid-testsuite/integration/config.py:80-99).
"""

config_properties = {
    "LogResourceList": ["file:///tmp/parity_syslog"],
    "AminerUser": "aminer",
    "AminerGroup": "aminer",
    # PersistenceDir is overridden by the capture script to a tmpdir
    "Core.PersistenceDir": "/tmp/parity_persistence",
    "LogPrefix": "Original log line: ",
}


def build_analysis_pipeline(analysis_context):
    """Build the deterministic parity pipeline (reference config API)."""
    from aminer.analysis import AtomFilters
    from aminer.analysis.NewMatchPathDetector import NewMatchPathDetector
    from aminer.analysis.NewMatchPathValueComboDetector import (
        NewMatchPathValueComboDetector,
    )
    from aminer.analysis.NewMatchPathValueDetector import NewMatchPathValueDetector
    from aminer.analysis.TimestampsUnsortedDetector import TimestampsUnsortedDetector
    from aminer.analysis.UnparsedAtomHandlers import SimpleUnparsedAtomHandler
    from aminer.events.StreamPrinterEventHandler import StreamPrinterEventHandler
    from aminer.input.SimpleByteStreamLineAtomizerFactory import (
        SimpleByteStreamLineAtomizerFactory,
    )
    from aminer.parsing.AnyByteDataModelElement import AnyByteDataModelElement
    from aminer.parsing.DateTimeModelElement import DateTimeModelElement
    from aminer.parsing.DelimitedDataModelElement import DelimitedDataModelElement
    from aminer.parsing.FirstMatchModelElement import FirstMatchModelElement
    from aminer.parsing.FixedDataModelElement import FixedDataModelElement
    from aminer.parsing.SequenceModelElement import SequenceModelElement

    parsing_model = FirstMatchModelElement("model", [
        SequenceModelElement("DiskUpgrade", [
            DateTimeModelElement("DTM", b"%Y-%m-%d %H:%M:%S"),
            FixedDataModelElement("UNameSpace1", b" "),
            DelimitedDataModelElement("UName", b" "),
            FixedDataModelElement("UNameSpace2", b" "),
            DelimitedDataModelElement("User", b" "),
            FixedDataModelElement("HDRepair", b" System rebooted for hard disk upgrade"),
        ]),
        SequenceModelElement("HomePath", [
            FixedDataModelElement(
                "Pwd", b"The Path of the home directory shown by pwd of the user "
            ),
            DelimitedDataModelElement("Username", b" "),
            FixedDataModelElement("Is", b" is: "),
            AnyByteDataModelElement("Path"),
        ]),
    ])

    atom_filter = AtomFilters.SubhandlerFilter(None)
    printer = StreamPrinterEventHandler(analysis_context)
    handlers = [printer]
    analysis_context.atomizer_factory = SimpleByteStreamLineAtomizerFactory(
        parsing_model, [atom_filter], handlers,
        default_timestamp_path_list=["/model/DiskUpgrade/DTM"],
        use_real_time=True,
    )

    unparsed = SimpleUnparsedAtomHandler(handlers)
    atom_filter.add_handler(unparsed, stop_when_handled_flag=True)
    analysis_context.register_component(unparsed, component_name="UnparsedHandler")

    unsorted = TimestampsUnsortedDetector(analysis_context.aminer_config, handlers)
    atom_filter.add_handler(unsorted)
    analysis_context.register_component(unsorted, component_name="Unsorted")

    nmpd = NewMatchPathDetector(
        analysis_context.aminer_config, handlers, learn_mode=True
    )
    atom_filter.add_handler(nmpd)
    analysis_context.register_component(nmpd, component_name="NewPath")

    nmpvd = NewMatchPathValueDetector(
        analysis_context.aminer_config, ["/model/HomePath/Username"], handlers,
        learn_mode=True,
    )
    atom_filter.add_handler(nmpvd)
    analysis_context.register_component(nmpvd, component_name="NewValue")

    combo = NewMatchPathValueComboDetector(
        analysis_context.aminer_config,
        ["/model/HomePath/Username", "/model/HomePath/Path"],
        handlers, learn_mode=True,
    )
    atom_filter.add_handler(combo)
    analysis_context.register_component(combo, component_name="NewValueCombo")
