"""YAML config source with !ENV interpolation + schema validation
(SURVEY §2.1 S12).

Reference parity: configuration/configuration.py:71-117 loads YAML,
substitutes ``!ENV ${VAR}`` tags from the environment, and validates
against a JSON-Schema. One deliberate fix (SURVEY §5 note): the
reference's schema puts `required`/`properties` as SIBLINGS of `items`
on array schemas, which draft-04 silently ignores — stale configs
validated and then crashed at runtime. Our schema nests them inside
`items`, so validation actually fires.
"""

from __future__ import annotations

import os
import re
from typing import Any

import yaml

_ENV_PATTERN = re.compile(r"\$\{([^}^{]+)\}")
# Implicit-resolver pattern: PyYAML anchors resolvers with
# regexp.match, so without the leading .* a value like
# "/prefix/${VAR}/nodes.csv" would NOT be tagged !ENV and would load
# as the literal string — a silently unsubstituted path. The
# substitution itself still uses _ENV_PATTERN (findall, any position).
_ENV_RESOLVER = re.compile(r".*\$\{[^}^{]+\}.*")
_ENV_TAG = "!ENV"


def _env_constructor(loader: yaml.SafeLoader, node: yaml.Node) -> Any:
    value = loader.construct_scalar(node)
    for var in _ENV_PATTERN.findall(value):
        value = value.replace(f"${{{var}}}", os.environ.get(var, ""))
    return value


def _loader() -> type[yaml.SafeLoader]:
    class EnvLoader(yaml.SafeLoader):
        pass

    EnvLoader.add_implicit_resolver(_ENV_TAG, _ENV_RESOLVER, None)
    EnvLoader.add_constructor(_ENV_TAG, _env_constructor)
    return EnvLoader


# Engine run-config schema: the shape main-loop callers consume
# (mirrors the reference's tag/config sections it actually reads).
RUN_SCHEMA: dict[str, Any] = {
    "type": "object",
    "required": ["spark", "input", "run_options"],
    "properties": {
        "spark": {
            "type": "object",
            "properties": {"config": {"type": "object"}},
        },
        "input": {
            "type": "object",
            "required": ["nodes", "edges"],
            "properties": {
                "nodes": {
                    "type": "object",
                    "required": ["path", "feature_names"],
                    "properties": {
                        "path": {"type": "string"},
                        "feature_names": {
                            "type": "array",
                            "items": {"type": "string"},
                            "minItems": 1,
                        },
                        "delimiter": {"type": "string"},
                        "has_header": {"type": "boolean"},
                        "encoding": {"type": "string"},
                    },
                },
                "edges": {
                    "type": "object",
                    "required": ["path"],
                    "properties": {
                        "path": {"type": "string"},
                        "delimiter": {"type": "string"},
                        "has_weights": {"type": "boolean"},
                        "has_header": {"type": "boolean"},
                    },
                },
            },
        },
        "run_options": {
            "type": "object",
            "properties": {
                "r_lvl1_thres": {"type": "number"},
                "r_lvl2_thres": {"type": "number"},
                "max_edge_weight": {"type": "number"},
                "betweenness_thres": {"type": "number"},
                "feature_min_avg": {"type": "number"},
                "max_steps": {"type": "integer", "minimum": 1},
                "max_sp_length": {"type": "integer", "minimum": 1},
                "min_comp_size": {"type": "integer", "minimum": 1},
                # main.py consumes this: without the property entry a
                # wrongly-typed value (a bare string iterates as
                # characters) would validate silently — the exact
                # silent-pass failure mode this module exists to fix.
                "features_to_check": {
                    "type": "array",
                    "items": {"type": "string"},
                    "minItems": 1,
                },
            },
        },
    },
}


def load_config(path: str, schema: dict[str, Any] | None = None) -> dict[str, Any]:
    """Load + !ENV-substitute + validate. Raises jsonschema
    ValidationError on a bad config (the reference's silent-pass bug is
    fixed by nesting array constraints properly)."""
    with open(path, encoding="utf-8") as fh:
        conf = yaml.load(fh, Loader=_loader())
    import jsonschema

    jsonschema.validate(conf, schema or RUN_SCHEMA)
    return conf
