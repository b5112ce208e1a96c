"""Regenerate EXPECTED_ENA_TAB by executing the *reference*
implementation over the fixture corpus with an offline DB stub.

Usage: python tests/tools/gen_golden.py
Prints the sorted golden rows; paste into tests/fixtures/embl_fixtures.py.
The reference tree is only imported, never modified.
"""

import gzip
import sys
import tempfile
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, "/root/reference/ena_build")
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import parse_embl  # noqa: E402  (reference module, read-only)
from fixtures.embl_fixtures import FILES, IDMAPPING  # noqa: E402


class StubMapper:
    """Mimics mysql_database.IDMapper.reverse_mapping's return contract:
    ({foreign_id -> set(uniprot_id)}, [no-match foreign ids])."""

    def __init__(self, pairs):
        self.table = defaultdict(set)
        for foreign_id, uniprot_id in pairs:
            self.table[foreign_id].add(uniprot_id)

    def reverse_mapping(self, ids):
        mapping = {i: self.table[i] for i in ids if i in self.table}
        no_match = [i for i in ids if i not in self.table]
        return mapping, no_match


def main():
    db = StubMapper(IDMAPPING)
    rows = []
    with tempfile.TemporaryDirectory() as tmp:
        tmp = Path(tmp)
        for rel, text in FILES.items():
            # reproduce the listing-time F1 filter (dask_tasks.py:78-85)
            import re as _re

            dir_part, name = rel.rsplit("/", 1)
            if "sequence" in dir_part and not _re.search(
                r"_(ENV|PRO|FUN|PHG)_", name
            ):
                continue
            src = tmp / rel
            src.parent.mkdir(parents=True, exist_ok=True)
            with gzip.open(src, "wt") as f:
                f.write(text)
            out = tmp / (rel.replace("/", "_") + ".tab")
            parse_embl.process_file(str(src), db, str(out))
            if out.exists():
                for line in out.read_text().splitlines():
                    e, u, c, s, d, st, en = line.split("\t")
                    rows.append((e, u, int(c), int(s), int(d), int(st), int(en)))
    for r in sorted(rows):
        print(f"    {r!r},")


if __name__ == "__main__":
    main()
