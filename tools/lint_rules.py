"""Ruleset lint — the ``sagan -T`` config-test analog (the reference
validates its whole rule/classification surface at startup and aborts
with the offending location: reference/src/sagan.c:176,383-385,
rules.c:370-389). Loads classifications + every rule file, reports every
problem as ``file:line: error: message``, exits 1 on any. Usage:

    python tools/lint_rules.py FILE.rules [...] \
        [--classifications classification.config] [--var NAME=VALUE]

Checks:
- classification.config parses (malformed lines located);
- every rule parses (all 66 rules.c option keywords; parse errors carry
  the logical rule's FIRST source line — continuation lines fold in);
- ``var`` lines are well-formed; unknown ``$VAR`` references fail inside
  the parser as usual;
- classtype names resolve against the loaded classifications;
- sids are unique ACROSS all linted files (duplicate shows both sites);
- ``dynamic_load`` target paths exist after $VAR expansion.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def lint_rules_text(text: str, fname: str, variables: dict[str, str],
                    classifications: dict[str, int] | None,
                    sid_sites: dict[int, str]) -> list[str]:
    """Lint one rules file's text; mutates ``variables`` (var lines carry
    forward, as in parse_rules) and ``sid_sites``. Returns error strings."""
    from sagan_ray.rules.parser import RuleParseError, _parse_one

    errors: list[str] = []
    # line joining replicated from parse_rules, tracking the FIRST source
    # line of each logical rule for the error location
    logical: list[tuple[int, str]] = []
    pending = ""
    pending_ln = 0
    for ln, raw in enumerate(text.splitlines(), 1):
        stripped = raw.strip()
        if not stripped or stripped.startswith("#"):
            continue
        if pending:
            line, first = pending + " " + stripped, pending_ln
        else:
            line, first = stripped, ln
        pending = ""
        if line.endswith("\\"):
            pending, pending_ln = line[:-1], first
            continue
        logical.append((first, line))
    if pending:
        logical.append((pending_ln, pending.strip()))

    for first, line in logical:
        loc = f"{fname}:{first}"
        if line.startswith("var "):
            parts = line.split(None, 2)
            if len(parts) < 3:
                errors.append(f"{loc}: error: malformed var line "
                              f"(need 'var NAME value'): {line!r}")
            else:
                variables[parts[1]] = parts[2].strip()
            continue
        try:
            rule = _parse_one(line, variables, classifications)
        except RuleParseError as e:
            errors.append(f"{loc}: error: {e}")
            continue
        except Exception as e:   # defensive — a crash is still a lint hit
            errors.append(f"{loc}: error: parser crash: {e}")
            continue
        if not rule.sid:
            # reference aborts on missing sid (rules.c:370-389)
            errors.append(f"{loc}: error: rule missing sid: {rule.msg!r}")
        elif rule.sid in sid_sites:
            errors.append(f"{loc}: error: duplicate sid {rule.sid} "
                          f"(first defined at {sid_sites[rule.sid]})")
        else:
            sid_sites[rule.sid] = loc
        if rule.dynamic_ruleset and not os.path.exists(rule.dynamic_ruleset):
            errors.append(f"{loc}: error: dynamic_load target does not "
                          f"exist: {rule.dynamic_ruleset!r}")
    return errors


def lint(paths: list[str], classifications_path: str | None = None,
         variables: dict[str, str] | None = None) -> list[str]:
    """Lint rule files; returns all error strings (empty = clean)."""
    from sagan_ray.rules.parser import RuleParseError, load_classifications

    errors: list[str] = []
    classifications = None
    if classifications_path is not None:
        try:
            classifications = load_classifications(classifications_path)
        except RuleParseError as e:
            errors.append(f"{classifications_path}: error: {e}")
        except OSError as e:
            errors.append(f"{classifications_path}: error: {e}")
    vars_acc = dict(variables or {})
    sid_sites: dict[int, str] = {}
    for p in paths:
        try:
            with open(p, "r", encoding="utf-8") as f:
                text = f.read()
        except OSError as e:
            errors.append(f"{p}: error: {e}")
            continue
        errors.extend(lint_rules_text(text, p, vars_acc, classifications,
                                      sid_sites))
    return errors


def main() -> int:
    args = sys.argv[1:]
    paths: list[str] = []
    cls_path = None
    variables: dict[str, str] = {}
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--classifications":
            i += 1
            cls_path = args[i]
        elif a == "--var":
            i += 1
            k, _, v = args[i].partition("=")
            variables[k] = v
        else:
            paths.append(a)
        i += 1
    if not paths:
        print(__doc__)
        return 2
    errors = lint(paths, cls_path, variables)
    for e in errors:
        print(e)
    if errors:
        print(f"FAILED: {len(errors)} problem(s)")
        return 1
    print(f"OK: {len(paths)} file(s) clean")
    return 0


if __name__ == "__main__":
    sys.exit(main())
