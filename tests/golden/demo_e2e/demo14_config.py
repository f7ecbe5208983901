"""Fourteenth deterministic parity pipeline — EventCorrelationDetector with
a pinned random seed (round-5 VERDICT item 3, second half: the hypothesis
sampling uses the stdlib ``random`` module,
EventCorrelationDetector.py:523-524,654; seeding freezes which hypotheses
are generated and when, making the learned rules and their violation
events a stable golden).

Consumed only by scripts/capture_demo_golden.py. Parameters are chosen so
the stochastic machine is exercised but bounded: singleton candidate deque,
generation always fires (only the direction draw varies), max_observations=4
with p0=0.99 -> min_eval_true=4 (zero miss tolerance: one missing implied
event both kills a hypothesis and violates a rule). The corpus holds eight
clean A->B pairs 30 s apart (hypotheses form, stabilize into forward AND
back rules), one broken pair (B arrives 20 s late -> one forward and one
back violation), and two recovery pairs.
"""

config_properties = {
    "LogResourceList": ["file:///tmp/parity_syslog14"],
    "AminerUser": "aminer",
    "AminerGroup": "aminer",
    "Core.PersistenceDir": "/tmp/parity_persistence14",
    "LogPrefix": "Original log line: ",
}

RANDOM_SEED = 7


def build_analysis_pipeline(analysis_context):
    """Build the EventCorrelationDetector parity pipeline."""
    import random

    from aminer.analysis import AtomFilters
    from aminer.analysis.EventCorrelationDetector import EventCorrelationDetector
    from aminer.analysis.NewMatchPathDetector import NewMatchPathDetector
    from aminer.analysis.UnparsedAtomHandlers import SimpleUnparsedAtomHandler
    from aminer.events.StreamPrinterEventHandler import StreamPrinterEventHandler
    from aminer.input.SimpleByteStreamLineAtomizerFactory import (
        SimpleByteStreamLineAtomizerFactory,
    )
    from aminer.parsing.AnyByteDataModelElement import AnyByteDataModelElement
    from aminer.parsing.DateTimeModelElement import DateTimeModelElement
    from aminer.parsing.FixedDataModelElement import FixedDataModelElement
    from aminer.parsing.SequenceModelElement import SequenceModelElement

    random.seed(RANDOM_SEED)

    parsing_model = SequenceModelElement("Evt", [
        DateTimeModelElement("DTM", b"%Y-%m-%d %H:%M:%S"),
        FixedDataModelElement("Fix", b" evt "),
        AnyByteDataModelElement("evt"),
    ])

    atom_filter = AtomFilters.SubhandlerFilter(None)
    printer = StreamPrinterEventHandler(analysis_context)
    handlers = [printer]
    analysis_context.atomizer_factory = SimpleByteStreamLineAtomizerFactory(
        parsing_model, [atom_filter], handlers,
        default_timestamp_path_list=["/Evt/DTM"],
        use_real_time=True,
    )

    unparsed = SimpleUnparsedAtomHandler(handlers)
    atom_filter.add_handler(unparsed, stop_when_handled_flag=True)
    analysis_context.register_component(unparsed, component_name="Unparsed14")

    nmpd = NewMatchPathDetector(
        analysis_context.aminer_config, handlers, learn_mode=True
    )
    atom_filter.add_handler(nmpd)
    analysis_context.register_component(nmpd, component_name="NewPath14")

    ecd = EventCorrelationDetector(
        analysis_context.aminer_config, handlers,
        target_path_list=["/Evt/evt"],
        hypothesis_max_delta_time=5.0,
        generation_probability=1.0, generation_factor=1.0,
        max_observations=4, p0=0.99, alpha=0.05, candidates_size=1,
        hypotheses_eval_delta_time=1e10,
        delta_time_to_discard_hypothesis=1e10,
        check_rules_flag=True, learn_mode=True,
    )
    atom_filter.add_handler(ecd)
    analysis_context.register_component(ecd, component_name="EvtCorr14")
