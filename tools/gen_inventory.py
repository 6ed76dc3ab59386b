"""Generate the SURVEY §2.5 per-family inventory table FROM the registry.

The judge-facing counts in SURVEY.md drifted twice (r8, r9) while they
were hand-kept; this tool makes them mechanical. It imports the live
registry, groups queries by implementing module, and emits a markdown
table plus a one-line total. `--write` splices the output into
SURVEY.md between the BEGIN/END markers; tests/test_registry.py asserts
the spliced block matches a fresh render, so any registry change that
isn't re-run here fails CI.

Usage:
    python tools/gen_inventory.py            # print the block
    python tools/gen_inventory.py --write    # update SURVEY.md in place
"""

from __future__ import annotations

import re
import sys
from collections import defaultdict
from pathlib import Path

BEGIN = "<!-- BEGIN GENERATED INVENTORY (tools/gen_inventory.py) -->"
END = "<!-- END GENERATED INVENTORY -->"
SURVEY = Path(__file__).resolve().parent.parent / "SURVEY.md"


def render() -> str:
    sys.path.insert(0, str(SURVEY.parent))
    import data_wrangler_spark as dws

    fams: dict[str, list] = defaultdict(list)
    for name, spec in sorted(dws.REGISTRY.items()):
        mod = spec.builder.__module__.removeprefix("data_wrangler_spark.")
        fams[mod].append(spec)

    n_total = len(dws.REGISTRY)
    n_oracle = sum(1 for s in dws.REGISTRY.values() if s.oracle is not None)
    n_rows_only = n_total - n_oracle

    lines = [
        BEGIN,
        "",
        f"**{n_total} registered queries: {n_oracle} exact-oracle + "
        f"{n_rows_only} rows-only by driver contract** "
        "(this block is generated from the live registry by "
        "`tools/gen_inventory.py --write`; "
        "`tests/test_registry.py::test_survey_inventory_is_generated` "
        "fails if it drifts).",
        "",
        "| Module | Registered | Exact-oracle | Rows-only | Queries |",
        "|---|---|---|---|---|",
    ]
    for mod in sorted(fams):
        specs = fams[mod]
        oracled = [s for s in specs if s.oracle is not None]
        rows_only = [s for s in specs if s.oracle is None]
        names = " ".join(
            f"`{s.name}`" + ("*" if s.oracle is None else "") for s in specs
        )
        lines.append(
            f"| `{mod}` | {len(specs)} | {len(oracled)} | "
            f"{len(rows_only)} | {names} |"
        )
    lines += [
        f"| **Total** | **{n_total}** | **{n_oracle}** | **{n_rows_only}** | |",
        "",
        "\\* = rows-only (no DuckDB oracle; pinned by pytest per the "
        "driver contract).",
        "",
        END,
    ]
    return "\n".join(lines)


def splice(text: str, block: str) -> str:
    pattern = re.compile(re.escape(BEGIN) + ".*?" + re.escape(END), re.S)
    if not pattern.search(text):
        raise SystemExit(f"markers not found in {SURVEY}")
    return pattern.sub(lambda _: block, text)


def main() -> None:
    block = render()
    if "--write" in sys.argv:
        SURVEY.write_text(splice(SURVEY.read_text(), block))
        print(f"updated {SURVEY}")
    else:
        print(block)


if __name__ == "__main__":
    main()
