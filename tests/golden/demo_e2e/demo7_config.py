"""Seventh deterministic parity pipeline — XML input axis.

Consumed only by scripts/capture_demo_golden.py (see ref_config.py for the
harness contract). Mirrors the aminerXmlInputDemo shape
(aecid-testsuite/demo/aminerXmlInputDemo/xml-input-demo-config.yml):
XmlModelElement over a note document with attributes and optional keys,
xml_format atomizer (the whole resource is ONE atom), NewMatchPathDetector
+ NewMatchPathValueDetector + NewMatchPathValueComboDetector.
"""

config_properties = {
    "LogResourceList": ["file:///tmp/parity_syslog7"],
    "AminerUser": "aminer",
    "AminerGroup": "aminer",
    "Core.PersistenceDir": "/tmp/parity_persistence7",
    "LogPrefix": "Original log line: ",
}


def build_analysis_pipeline(analysis_context):
    """Build the seventh parity pipeline (reference config API)."""
    from aminer.analysis import AtomFilters
    from aminer.analysis.NewMatchPathDetector import NewMatchPathDetector
    from aminer.analysis.NewMatchPathValueComboDetector import (
        NewMatchPathValueComboDetector,
    )
    from aminer.analysis.NewMatchPathValueDetector import NewMatchPathValueDetector
    from aminer.analysis.UnparsedAtomHandlers import SimpleUnparsedAtomHandler
    from aminer.events.StreamPrinterEventHandler import StreamPrinterEventHandler
    from aminer.input.SimpleByteStreamLineAtomizerFactory import (
        SimpleByteStreamLineAtomizerFactory,
    )
    from aminer.parsing.AnyByteDataModelElement import AnyByteDataModelElement
    from aminer.parsing.DecimalIntegerValueModelElement import (
        DecimalIntegerValueModelElement,
    )
    from aminer.parsing.FixedDataModelElement import FixedDataModelElement
    from aminer.parsing.XmlModelElement import XmlModelElement

    parsing_model = XmlModelElement("model", {
        "messages": [{
            "note": {
                "+id": DecimalIntegerValueModelElement("id"),
                "_+opt": FixedDataModelElement("opt", b"text"),
                "to": AnyByteDataModelElement("to"),
                "from": AnyByteDataModelElement("from"),
                "?heading": AnyByteDataModelElement("heading"),
                "body": {
                    "text1": AnyByteDataModelElement("text1"),
                    "text2": AnyByteDataModelElement("text2"),
                },
            },
        }],
    }, xml_header_expected=True)

    atom_filter = AtomFilters.SubhandlerFilter(None)
    printer = StreamPrinterEventHandler(analysis_context)
    handlers = [printer]
    analysis_context.atomizer_factory = SimpleByteStreamLineAtomizerFactory(
        parsing_model, [atom_filter], handlers,
        xml_format=True, use_real_time=True,
    )

    unparsed = SimpleUnparsedAtomHandler(handlers)
    atom_filter.add_handler(unparsed, stop_when_handled_flag=True)
    analysis_context.register_component(unparsed, component_name="Unparsed7")

    nmpd = NewMatchPathDetector(
        analysis_context.aminer_config, handlers, learn_mode=True
    )
    atom_filter.add_handler(nmpd)
    analysis_context.register_component(nmpd, component_name="NewPath7")

    nmpvd = NewMatchPathValueDetector(
        analysis_context.aminer_config, ["/model/messages/note/to/to"], handlers,
        learn_mode=True,
    )
    atom_filter.add_handler(nmpvd)
    analysis_context.register_component(nmpvd, component_name="NoteTo")

    combo = NewMatchPathValueComboDetector(
        analysis_context.aminer_config,
        ["/model/messages/note/to/to", "/model/messages/note/from/from"], handlers,
        learn_mode=True,
    )
    atom_filter.add_handler(combo)
    analysis_context.register_component(combo, component_name="NoteCombo")
