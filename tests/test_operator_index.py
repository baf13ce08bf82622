"""README registry index stays in sync with the registry + reports.

Adding a queries() entry, dropping an oracle, or committing a newer
self-check/robustness round without regenerating the README table
fails HERE with the one-line fix, instead of shipping a stale
coverage index (r8 verdict ask #10).
"""

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def test_readme_operator_index_in_sync():
    import gen_operator_index as g
    with open(os.path.join(_REPO, "README.md")) as fh:
        readme = fh.read()
    assert g.BEGIN in readme and g.END in readme, \
        "README lost the OPERATOR-INDEX markers"
    assert g.render_readme(readme, g.build_table()) == readme, \
        "stale registry index — run: python gen_operator_index.py"


def test_index_covers_whole_registry():
    import __spark_entry__ as entry

    import gen_operator_index as g
    table = g.build_table()
    missing = [n for n in entry.queries() if f"| {n} |" not in table]
    assert not missing, missing
