"""Fifth deterministic parity pipeline — JSON input axis.

Consumed only by scripts/capture_demo_golden.py (see ref_config.py for the
harness contract). Mirrors the aminerJsonInputDemo shape
(aecid-testsuite/demo/aminerJsonInputDemo/json-input-demo-config.yml):
JsonModelElement over the json.org menu document, json_format atomizer,
NewMatchPathDetector + NewMatchPathValueDetector +
NewMatchPathValueComboDetector + unparsed handling.
"""

config_properties = {
    "LogResourceList": ["file:///tmp/parity_syslog5"],
    "AminerUser": "aminer",
    "AminerGroup": "aminer",
    "Core.PersistenceDir": "/tmp/parity_persistence5",
    "LogPrefix": "Original log line: ",
}


def build_analysis_pipeline(analysis_context):
    """Build the fifth parity pipeline (reference config API)."""
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
    from aminer.parsing.FixedWordlistDataModelElement import (
        FixedWordlistDataModelElement,
    )
    from aminer.parsing.JsonModelElement import JsonModelElement
    from aminer.parsing.VariableByteDataModelElement import (
        VariableByteDataModelElement,
    )

    alpha = b"abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ 0123456789_-."
    parsing_model = JsonModelElement("model", {
        "menu": {
            "id": VariableByteDataModelElement("id", alpha),
            "value": VariableByteDataModelElement("value", alpha),
            "popup": {
                "menuitem": [{
                    "value": FixedWordlistDataModelElement(
                        "buttonNames", [b"New", b"Open", b"Close"]
                    ),
                    "onclick": FixedWordlistDataModelElement(
                        "buttonOnclick",
                        [b"CreateNewDoc()", b"OpenDoc()", b"CloseDoc()"],
                    ),
                }],
            },
        },
    })

    atom_filter = AtomFilters.SubhandlerFilter(None)
    printer = StreamPrinterEventHandler(analysis_context)
    handlers = [printer]
    analysis_context.atomizer_factory = SimpleByteStreamLineAtomizerFactory(
        parsing_model, [atom_filter], handlers,
        json_format=True, use_real_time=True,
    )

    unparsed = SimpleUnparsedAtomHandler(handlers)
    atom_filter.add_handler(unparsed, stop_when_handled_flag=True)
    analysis_context.register_component(unparsed, component_name="Unparsed5")

    nmpd = NewMatchPathDetector(
        analysis_context.aminer_config, handlers, learn_mode=True
    )
    atom_filter.add_handler(nmpd)
    analysis_context.register_component(nmpd, component_name="NewPath5")

    nmpvd = NewMatchPathValueDetector(
        analysis_context.aminer_config, ["/model/menu/id/id"], handlers,
        learn_mode=True,
    )
    atom_filter.add_handler(nmpvd)
    analysis_context.register_component(nmpvd, component_name="MenuId")

    combo = NewMatchPathValueComboDetector(
        analysis_context.aminer_config,
        ["/model/menu/id/id", "/model/menu/value/value"], handlers,
        learn_mode=True,
    )
    atom_filter.add_handler(combo)
    analysis_context.register_component(combo, component_name="MenuCombo")
