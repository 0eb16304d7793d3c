"""A complete EnergyPlus-file workflow: IDF in, annual demand out.

``examples/data/office.idf`` is a 3-zone office exercising the whole heatx
IDF subset — insulated envelope, an argon double-glazed facade plus U/SHGC
simple glazing, interior partitions and furniture mass, zone-list internal
gains on office schedules, scheduled infiltration/ventilation, and
night-setback thermostats imported as ideal loads.  This script is the
same run a shell user gets from

    python -m heatx simulate examples/data/office.idf weather.epw \
        --hours 8760 -o zones.csv --loads-csv demand.csv

Run:  python examples/office_idf.py [--hours 8760] [--epw path.epw]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hours", type=int, default=8760)
    ap.add_argument(
        "--epw",
        default=os.environ.get(
            "HEATX_EPW",
            "/root/reference/tests/epw/CHL_Santiago.855740_IWEC.epw",
        ),
    )
    ap.add_argument("--out", default="/tmp/office_zones.csv")
    ap.add_argument("--loads", default="/tmp/office_demand.csv")
    args = ap.parse_args()
    if os.environ.get("HEATX_EXAMPLE_FAST") == "1":  # smoke-test settings
        args.hours = min(args.hours, 48)
    if not os.path.isfile(args.epw):
        print(f"EPW not found: {args.epw} (set --epw)", file=sys.stderr)
        return 2

    from heatx.cli import main as heatx_main

    return heatx_main([
        "simulate", os.path.join(HERE, "data", "office.idf"), args.epw,
        "--hours", str(args.hours), "-o", args.out,
        "--loads-csv", args.loads, "--mode", "trbdf2",
    ])


if __name__ == "__main__":
    sys.exit(main())
