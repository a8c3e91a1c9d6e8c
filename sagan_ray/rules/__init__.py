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
from .parser import (  # noqa: F401
    load_classifications,
    parse_classifications,
    parse_rules,
    parse_rules_file,
)
