"""Config load + validation (reference parity).

Reproduces every validation the reference performs at startup
(notebooks/ETL_Entregas_Base.ipynb:150-232) over the same config shape
(config/config.yaml:1-18), including the historical `proccess` (sic)
misspelling kept for config compatibility (CFG:8, NB:173-180):

  paths:            raw_csv, output_root              (CFG:1-3)
  params:           [{country, start_date, end_date, proccess}]  (CFG:4-8)
  delivery_types:   routine: [...], bonus: [...]      (CFG:9-15)
  unit_factors:     {CS: 20, ST: 1}                   (CFG:16-18)

Validations (same checks, same spirit of error messages):
  - 4 sections present (NB:165-169)
  - every params block has country/start_date/end_date/proccess and
    proccess in {YES, NO} (NB:172-180)
  - routine/bonus lists present, normalized upper/strip, disjoint
    (NB:185-195)
  - unit_factors non-empty, keys non-blank, values numeric > 0
    (NB:199-220)

PyYAML/OmegaConf are not required: a minimal YAML-subset parser handles
the reference config shape; if PyYAML is importable it is used instead.
"""

from __future__ import annotations

import copy
from dataclasses import dataclass, field
from typing import Any

try:  # pragma: no cover - environment-dependent
    import yaml as _yaml
except Exception:  # noqa: BLE001
    _yaml = None


class ConfigError(ValueError):
    """Raised on any config validation failure (parity: NB:150-232)."""


# ---------------------------------------------------------------- YAML ----
def _parse_scalar(s: str) -> Any:
    s = s.strip()
    if s == "" or s.lower() in ("null", "~"):
        return None
    if (s.startswith("'") and s.endswith("'")) or (s.startswith('"') and s.endswith('"')):
        return s[1:-1]
    low = s.lower()
    if low in ("true", "yes") and s in ("true", "True"):
        return True
    if low in ("false", "no") and s in ("false", "False"):
        return False
    try:
        return int(s)
    except ValueError:
        pass
    try:
        return float(s)
    except ValueError:
        pass
    if s.startswith("[") and s.endswith("]"):
        inner = s[1:-1].strip()
        return [] if not inner else [_parse_scalar(x) for x in inner.split(",")]
    return s


def _mini_yaml_load(text: str) -> dict:
    """Parse the block-mapping / block-list YAML subset the reference
    config uses (nested maps by indentation, `- key: val` list items,
    inline flow lists). Not a general YAML parser."""
    root: dict = {}
    # stack of (indent, container)
    stack: list[tuple[int, Any]] = [(-1, root)]
    lines = [
        ln for ln in text.splitlines() if ln.strip() and not ln.strip().startswith("#")
    ]
    i = 0
    while i < len(lines):
        raw = lines[i]
        indent = len(raw) - len(raw.lstrip(" "))
        line = raw.strip()
        is_item = line.startswith("- ")
        # A list's items may sit at the SAME indent as the key that
        # opened it (`params:` / `- country: ...` — the reference
        # config's actual shape, CFG:4-8), so a list stays on the
        # stack for same-indent `- ` lines; everything else pops on <=.
        while stack and (
            indent < stack[-1][0]
            or (
                indent == stack[-1][0]
                and not (is_item and isinstance(stack[-1][1], list))
            )
        ):
            stack.pop()
        parent = stack[-1][1]
        if line.startswith("- "):
            # list item: parent must be a list
            if not isinstance(parent, list):
                raise ConfigError(f"unexpected list item: {raw!r}")
            body = line[2:]
            if ":" in body:
                item: dict = {}
                parent.append(item)
                # `- key: val` then following deeper-indented keys
                k, _, v = body.partition(":")
                if v.strip():
                    item[k.strip()] = _parse_scalar(v)
                else:
                    item[k.strip()] = None
                stack.append((indent + 1, item))
            else:
                parent.append(_parse_scalar(body))
        else:
            k, _, v = line.partition(":")
            k = k.strip()
            if v.strip():
                parent[k] = _parse_scalar(v)
            else:
                # container: peek next line to decide list vs map
                nxt = lines[i + 1].strip() if i + 1 < len(lines) else ""
                child: Any = [] if nxt.startswith("- ") else {}
                parent[k] = child
                stack.append((indent, child))
        i += 1
    return root


def load_yaml(path: str) -> dict:
    with open(path, encoding="utf-8") as f:
        text = f.read()
    if _yaml is not None:
        return _yaml.safe_load(text)
    return _mini_yaml_load(text)


def dump_yaml(obj: dict, path: str) -> None:
    if _yaml is not None:  # pragma: no cover
        with open(path, "w", encoding="utf-8") as f:
            _yaml.safe_dump(obj, f, sort_keys=False)
        return

    def emit(o: Any, indent: int) -> list[str]:
        pad = " " * indent
        out: list[str] = []
        if isinstance(o, dict):
            for k, v in o.items():
                if isinstance(v, (dict, list)) and v:
                    out.append(f"{pad}{k}:")
                    out.extend(emit(v, indent + 2))
                else:
                    out.append(f"{pad}{k}: {_fmt(v)}")
        elif isinstance(o, list):
            for item in o:
                if isinstance(item, dict):
                    first = True
                    for k, v in item.items():
                        lead = f"{pad}- " if first else f"{pad}  "
                        out.append(f"{lead}{k}: {_fmt(v)}")
                        first = False
                else:
                    out.append(f"{pad}- {_fmt(item)}")
        return out

    def _fmt(v: Any) -> str:
        if v is None:
            return "null"
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, str):
            return f"'{v}'"
        return str(v)

    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(emit(obj, 0)) + "\n")


# ---------------------------------------------------------- validation ----
REQUIRED_SECTIONS = ("paths", "params", "delivery_types", "unit_factors")
REQUIRED_PARAM_FIELDS = ("country", "start_date", "end_date", "proccess")


@dataclass
class CountryParams:
    country: str
    start_date: str
    end_date: str
    proccess: str  # 'YES' | 'NO' — reference misspelling kept (CFG:8)


@dataclass
class EngineConfig:
    raw_csv: str
    output_root: str
    params: list[CountryParams]
    routine: list[str]
    bonus: list[str]
    unit_factors: dict[str, float]
    raw: dict = field(repr=False, default_factory=dict)


def validate_config(cfg: dict) -> EngineConfig:
    """All reference validations (NB:150-232), same failure classes."""
    if not isinstance(cfg, dict):
        raise ConfigError("config root must be a mapping")
    for section in REQUIRED_SECTIONS:  # NB:165-169
        if section not in cfg or cfg[section] is None:
            raise ConfigError(f"missing config section: '{section}'")

    paths = cfg["paths"]
    for key in ("raw_csv", "output_root"):
        if not isinstance(paths, dict) or not paths.get(key):
            raise ConfigError(f"paths.{key} is required")

    params_raw = cfg["params"]
    if not isinstance(params_raw, list) or not params_raw:
        raise ConfigError("params must be a non-empty list")
    params: list[CountryParams] = []
    for i, block in enumerate(params_raw):  # NB:172-180
        for f_ in REQUIRED_PARAM_FIELDS:
            if not isinstance(block, dict) or block.get(f_) in (None, ""):
                raise ConfigError(f"params[{i}].{f_} is required")
        proccess = str(block["proccess"]).strip().upper()
        if proccess not in ("YES", "NO"):
            raise ConfigError(
                f"params[{i}].proccess must be YES or NO, got {block['proccess']!r}"
            )
        params.append(
            CountryParams(
                country=str(block["country"]),
                start_date=str(block["start_date"]),
                end_date=str(block["end_date"]),
                proccess=proccess,
            )
        )

    dt = cfg["delivery_types"]
    if not isinstance(dt, dict):
        raise ConfigError("delivery_types must be a mapping")
    for key in ("routine", "bonus"):  # NB:185-195
        if not isinstance(dt.get(key), list) or not dt[key]:
            raise ConfigError(f"delivery_types.{key} must be a non-empty list")
    # normalization mirrors NB:189-190: s.strip().upper()
    routine = [str(s).strip().upper() for s in dt["routine"]]
    bonus = [str(s).strip().upper() for s in dt["bonus"]]
    overlap = set(routine) & set(bonus)
    if overlap:
        raise ConfigError(f"delivery_types routine/bonus overlap: {sorted(overlap)}")

    uf = cfg["unit_factors"]
    if not isinstance(uf, dict) or not uf:  # NB:199-220
        raise ConfigError("unit_factors must be a non-empty mapping")
    factors: dict[str, float] = {}
    for k, v in uf.items():
        key = str(k).strip().upper()
        if not key:
            raise ConfigError("unit_factors keys must be non-blank")
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            raise ConfigError(f"unit_factors[{k!r}] must be numeric, got {v!r}")
        if v <= 0:
            raise ConfigError(f"unit_factors[{k!r}] must be > 0, got {v!r}")
        factors[key] = float(v)

    return EngineConfig(
        raw_csv=str(paths["raw_csv"]),
        output_root=str(paths["output_root"]),
        params=params,
        routine=routine,
        bonus=bonus,
        unit_factors=factors,
        raw=copy.deepcopy(cfg),
    )


def load_config(path: str) -> EngineConfig:
    return validate_config(load_yaml(path))


def mark_country_processed(cfg: EngineConfig, country: str, path: str) -> None:
    """Compat shim for the reference's config-as-state pattern
    (NB:552-558): rewrite the YAML flipping `proccess` to YES. The
    engine's default run-state store is the run ledger
    (pipeline/runner.py); this exists only behind the compat flag."""
    raw = copy.deepcopy(cfg.raw)
    for block in raw["params"]:
        if str(block.get("country")) == country:
            block["proccess"] = "YES"
    dump_yaml(raw, path)
    for p in cfg.params:
        if p.country == country:
            p.proccess = "YES"
