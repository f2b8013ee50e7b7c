"""Synthetic HFP CSV fixtures per FIXTURES.md §A.

Generates headerless 44-column CSVs under ``<root>/csv/<EventGroup>/<date>-N.csv``
mirroring the reference blob layout (service/hfpStorage.ts:9-13,26-27), with
value domains that exercise every coercion path of
utils/transformHfpItem.ts:54-107.
"""

from __future__ import annotations

import csv
import random
import uuid as uuidlib
from pathlib import Path

from hfp_loader_spark.schema import HFP_COLUMNS

EVENT_GROUP_DIRS = {
    "stopEvent": "StopEvent",
    "otherEvent": "OtherEvent",
    "vehiclePosition": "VehiclePosition",
}

STOP_EVENT_TYPES = ["DUE", "ARR", "ARS", "PDE", "DEP", "PAS", "WAIT"]
OTHER_EVENT_TYPES = ["TLR", "TLA", "DA", "DOUT", "BA", "BOUT", "VJA", "VJOUT"]
JOURNEY_TYPES = ["journey", "deadrun", "signoff"]


def make_row(rng: random.Random, group: str, date: str, uuid: str) -> dict[str, str]:
    """One raw CSV row (all values strings, as the blob would carry them)."""
    iso_ts = f"{date}T{rng.randrange(24):02d}:{rng.randrange(60):02d}:30.000Z"
    epoch_ms = str(1612851330000 + rng.randrange(86_400_000))
    row = {c: "" for c in HFP_COLUMNS}
    row.update(
        {
            "acc": rng.choice(["1.5", "-0.3", "0", "", "abc"]),
            "desi": rng.choice(["551", "I", "", "value, with comma"]),
            "dir": rng.choice(["1", "2", ""]),
            "direction_id": rng.choice(["1", "2", ""]),
            "dl": rng.choice(["-30", "120", "0", "", "garbage"]),
            "dr_type": rng.choice(["1", ""]),
            "drst": rng.choice(["true", "false", "1", "0", ""]),
            "event_type": (
                "VP"
                if group == "vehiclePosition"
                else rng.choice(
                    STOP_EVENT_TYPES if group == "stopEvent" else OTHER_EVENT_TYPES
                )
            ),
            "geohash_level": rng.choice(["3", "4", ""]),
            "hdg": rng.choice(["270", "0", ""]),
            "headsign": rng.choice(["Itäkeskus", ""]),
            "is_ongoing": rng.choice(["true", "false", ""]),
            "journey_start_time": rng.choice(["06:15:00", ""]),
            "journey_type": rng.choice(JOURNEY_TYPES),
            "jrn": rng.choice(["812", ""]),
            "lat": rng.choice(["60.2451", "0", "", "nan"]),
            "line": rng.choice(["261", ""]),
            "loc": rng.choice(["GPS", "ODO", ""]),
            "long": rng.choice(["25.1093", "", "abc"]),
            "mode": rng.choice(["bus", "tram", "metro", ""]),
            "next_stop_id": rng.choice(["1453127", ""]),
            "occu": rng.choice(["0", "25", ""]),
            "oday": date,
            "odo": rng.choice(["15331.2", "0", ""]),
            "oper": rng.choice(["22", "0012", ""]),
            "owner_operator_id": rng.choice(["22", ""]),
            "received_at": rng.choice([iso_ts, epoch_ms, ""]),
            "route_id": rng.choice(["2551", ""]),
            "route": rng.choice(["2551", ""]),
            "seq": rng.choice(["1", ""]),
            "spd": rng.choice(["11.9", "0.0", "", "2.5"]),
            "start": rng.choice(["06:15:00", ""]),
            "stop": rng.choice(["1453127", ""]),
            "topic_latitude": rng.choice(["60.2", ""]),
            "topic_longitude": rng.choice(["25.1", ""]),
            "topic_prefix": "/hfp/",
            "topic_version": "v2",
            "tsi": rng.choice(["1612851330", ""]),
            "tst": rng.choice([iso_ts, epoch_ms]),
            "unique_vehicle_id": rng.choice(["0022/00854", ""]),
            "uuid": uuid,
            "veh": rng.choice(["854", ""]),
            "vehicle_number": rng.choice(["854", "2.5", ""]),
            "version": "1",
        }
    )
    return row


def write_fixture(
    root: Path,
    date: str = "2021-02-09",
    rows_per_group: int = 120,
    empty_uuid_every: int = 20,
    intra_dup_every: int = 25,
    n_files: int = 2,
    seed: int = 7,
) -> dict[str, list[dict[str, str]]]:
    """Write CSVs; return the raw rows per group for expected-value checks."""
    rng = random.Random(seed)
    rows_by_group: dict[str, list[dict[str, str]]] = {}
    for group, dirname in EVENT_GROUP_DIRS.items():
        gdir = root / "csv" / dirname
        gdir.mkdir(parents=True, exist_ok=True)
        rows: list[dict[str, str]] = []
        for i in range(rows_per_group):
            uid = "" if i % empty_uuid_every == 5 else str(
                uuidlib.UUID(int=rng.getrandbits(128))
            )
            row = make_row(rng, group, date, uid)
            rows.append(row)
            if uid and i % intra_dup_every == 7:
                rows.append(dict(row))  # intra-run duplicate (must pass twice)
        rows_by_group[group] = rows
        # spread across n_files blobs, plus whole-line edge cases
        per_file = (len(rows) + n_files - 1) // n_files
        for f in range(n_files):
            chunk = rows[f * per_file : (f + 1) * per_file]
            path = gdir / f"{date}-{f}.csv"
            with open(path, "w", newline="") as fh:
                w = csv.writer(fh, quoting=csv.QUOTE_MINIMAL)
                for j, row in enumerate(chunk):
                    w.writerow([row[c] for c in HFP_COLUMNS])
                    if j == 1:
                        fh.write("\n")  # fully empty line (skip_empty_lines)
                    if j == 2:
                        w.writerow([""] * len(HFP_COLUMNS))  # all-empty values line
    return rows_by_group
