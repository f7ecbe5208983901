"""Eighth deterministic parity pipeline — timer-driven ParserCount reports.

Consumed only by scripts/capture_demo_golden.py (see ref_config.py for the
harness contract). POST_DO_TIMER makes the harness replay the periodic
do_timer interrupt once after the stream, which is how ParserCount emits
its count report in a real aminer run (ParserCount.py:97-134).
"""

config_properties = {
    "LogResourceList": ["file:///tmp/parity_syslog8"],
    "AminerUser": "aminer",
    "AminerGroup": "aminer",
    "Core.PersistenceDir": "/tmp/parity_persistence8",
    "LogPrefix": "Original log line: ",
}

POST_DO_TIMER = True


def build_analysis_pipeline(analysis_context):
    """Build the eighth parity pipeline (reference config API)."""
    from aminer.analysis import AtomFilters
    from aminer.analysis.NewMatchPathDetector import NewMatchPathDetector
    from aminer.analysis.ParserCount import ParserCount
    from aminer.analysis.UnparsedAtomHandlers import SimpleUnparsedAtomHandler
    from aminer.events.StreamPrinterEventHandler import StreamPrinterEventHandler
    from aminer.input.SimpleByteStreamLineAtomizerFactory import (
        SimpleByteStreamLineAtomizerFactory,
    )
    from aminer.parsing.AnyByteDataModelElement import AnyByteDataModelElement
    from aminer.parsing.FixedDataModelElement import FixedDataModelElement
    from aminer.parsing.FixedWordlistDataModelElement import (
        FixedWordlistDataModelElement,
    )
    from aminer.parsing.SequenceModelElement import SequenceModelElement

    parsing_model = SequenceModelElement("model8", [
        FixedWordlistDataModelElement("verb", [b"login", b"logout"]),
        FixedDataModelElement("Sp", b" user "),
        AnyByteDataModelElement("name"),
    ])

    atom_filter = AtomFilters.SubhandlerFilter(None)
    printer = StreamPrinterEventHandler(analysis_context)
    handlers = [printer]
    analysis_context.atomizer_factory = SimpleByteStreamLineAtomizerFactory(
        parsing_model, [atom_filter], handlers, use_real_time=True,
    )

    unparsed = SimpleUnparsedAtomHandler(handlers)
    atom_filter.add_handler(unparsed, stop_when_handled_flag=True)
    analysis_context.register_component(unparsed, component_name="Unparsed8")

    nmpd = NewMatchPathDetector(
        analysis_context.aminer_config, handlers, learn_mode=True
    )
    atom_filter.add_handler(nmpd)
    analysis_context.register_component(nmpd, component_name="NewPath8")

    pc = ParserCount(
        analysis_context.aminer_config,
        ["/model8/verb", "/model8/name"], handlers, report_interval=60,
    )
    atom_filter.add_handler(pc)
    analysis_context.register_component(pc, component_name="Counts8")
