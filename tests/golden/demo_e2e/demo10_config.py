"""Tenth deterministic parity pipeline — multisource time-merge axis.

Consumed only by scripts/capture_demo_golden.py (see ref_config.py for the
harness contract). Two log resources flow through per-resource atomizers
into SimpleMultisourceAtomSync, which forwards atoms in merged timestamp
order (holding back newer sources); the sync wait windows are crossed by
the harness's deterministic clock. Downstream: NewMatchPathValueDetector
(one event per atom of the fixture, so the golden IS the forwarded order)
and TimestampsUnsortedDetector (must stay silent — the merge is monotonic).
"""

config_properties = {
    "LogResourceList": ["file:///parity0", "file:///parity1"],
    "AminerUser": "aminer",
    "AminerGroup": "aminer",
    "Core.PersistenceDir": "/tmp/parity_persistence10",
    "LogPrefix": "Original log line: ",
}


def build_analysis_pipeline(analysis_context):
    """Build the tenth parity pipeline (reference config API)."""
    from aminer.analysis import AtomFilters
    from aminer.analysis.NewMatchPathValueDetector import NewMatchPathValueDetector
    from aminer.analysis.TimestampsUnsortedDetector import TimestampsUnsortedDetector
    from aminer.analysis.UnparsedAtomHandlers import SimpleUnparsedAtomHandler
    from aminer.events.StreamPrinterEventHandler import StreamPrinterEventHandler
    from aminer.input.SimpleByteStreamLineAtomizerFactory import (
        SimpleByteStreamLineAtomizerFactory,
    )
    from aminer.input.SimpleMultisourceAtomSync import SimpleMultisourceAtomSync
    from aminer.parsing.AnyByteDataModelElement import AnyByteDataModelElement
    from aminer.parsing.DateTimeModelElement import DateTimeModelElement
    from aminer.parsing.FixedDataModelElement import FixedDataModelElement
    from aminer.parsing.SequenceModelElement import SequenceModelElement

    parsing_model = SequenceModelElement("model10", [
        DateTimeModelElement("DTM", b"%Y-%m-%d %H:%M:%S"),
        FixedDataModelElement("Fix", b" m "),
        AnyByteDataModelElement("word"),
    ])

    atom_filter = AtomFilters.SubhandlerFilter(None)
    printer = StreamPrinterEventHandler(analysis_context)
    handlers = [printer]
    sync = SimpleMultisourceAtomSync([atom_filter], sync_wait_time=5)
    analysis_context.atomizer_factory = SimpleByteStreamLineAtomizerFactory(
        parsing_model, [sync], handlers,
        default_timestamp_path_list=["/model10/DTM"],
        use_real_time=True,
    )
    analysis_context.register_component(sync, component_name="Sync10")

    unparsed = SimpleUnparsedAtomHandler(handlers)
    atom_filter.add_handler(unparsed, stop_when_handled_flag=True)
    analysis_context.register_component(unparsed, component_name="Unparsed10")

    unsorted = TimestampsUnsortedDetector(analysis_context.aminer_config, handlers)
    atom_filter.add_handler(unsorted)
    analysis_context.register_component(unsorted, component_name="Unsorted10")

    nmpvd = NewMatchPathValueDetector(
        analysis_context.aminer_config, ["/model10/word"], handlers,
        learn_mode=True, output_logline=False,
    )
    atom_filter.add_handler(nmpvd)
    analysis_context.register_component(nmpvd, component_name="Words10")
