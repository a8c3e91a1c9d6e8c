from .model import (  # noqa: F401
    AfterSpec,
    ContentAtom,
    FlexbitSpec,
    JsonAtom,
    MetaContent,
    PcreAtom,
    Rule,
    RuleSet,
    ThresholdSpec,
    XbitSpec,
)
from .parser import parse_rules, parse_rules_file  # noqa: F401
