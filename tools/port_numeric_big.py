"""One-off generator: extract numeric_big.sql's num_data values and the
bc(1)-computed num_exp_add/num_exp_sub expected results into
cloudberry_spark/sql/numeric_big_data.py.

    python tools/port_numeric_big.py
"""

from __future__ import annotations

import re

SRC = "/root/reference/src/test/regress/sql/numeric_big.sql"


def main() -> None:
    s = open(SRC).read()
    data = dict(
        re.findall(r"INSERT INTO num_data VALUES \((\d+), '([^']*)'\);", s)
    )
    add = re.findall(
        r"INSERT INTO num_exp_add VALUES \((\d+),(\d+),'([^']*)'\);", s
    )
    sub = re.findall(
        r"INSERT INTO num_exp_sub VALUES \((\d+),(\d+),'([^']*)'\);", s
    )
    out = [
        '"""numeric_big.sql data: the reference\'s NUMERIC(1000,800) '
        "values and\nits bc(1)-computed expected add/sub results "
        "(src/test/regress/sql/\nnumeric_big.sql:486-495 and the "
        "num_exp_add/num_exp_sub INSERT blocks).\nExtracted verbatim "
        'by tools/port_numeric_big.py."""\n\n'
    ]
    out.append("NUM_DATA = {\n")
    for k, v in sorted(data.items(), key=lambda x: int(x[0])):
        out.append(f"    {k}: {v!r},\n")
    out.append("}\n\nEXP_ADD = [\n")
    for a, b, v in add:
        out.append(f"    ({a}, {b}, {v!r}),\n")
    out.append("]\n\nEXP_SUB = [\n")
    for a, b, v in sub:
        out.append(f"    ({a}, {b}, {v!r}),\n")
    out.append("]\n")
    open("cloudberry_spark/sql/numeric_big_data.py", "w").write(
        "".join(out)
    )
    print(f"num_data={len(data)} add={len(add)} sub={len(sub)}")


if __name__ == "__main__":
    main()
