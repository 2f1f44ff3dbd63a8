"""Synthetic Bronze JSONL fixtures shaped like the three reference
sources (FIXTURES.md), covering the edge cases in FIXTURES.md §4:
dupes for W1, quarantine rows for P2, malformed geo for F9, nested
structures for N1-N7, Vietnamese diacritics for F3/F6, unix-millis for
D2, hectares for M7.
"""

from __future__ import annotations

import json
import os

CHOTOT_ROWS = [
    {
        "project_oid": "c1",
        "project_name": "Khu đô thị Phú Mỹ Hưng",
        "introduction": "<b>C&#259;n h&#7897;</b> cao c&aacute;p &amp; <br/> b&#7875; b&#417;i, gym",
        "full_address": "Q7, TPHCM",
        "ward_name": "Tân Phú",
        "area_name": "Quận 7",
        "region_name": "Hồ Chí Minh",
        "geo": "10.7340,106.7215",
        "area_total": 300000.5,
        "sell_price_lower": 2_500_000_000.0,
        "sell_price_higher": 5_000_000_000.0,
        "investor_name": "Phú Mỹ Hưng Corp",
        "facilities": ["pool", "gym"],
        "project_images": ["http://img/1.jpg"],
        "timestamp": "2024-01-10T08:00:00",
        "spider_name": "chotot_api",
        "process_run_id": "run1",
    },
    {   # duplicate of c1, older — W1 keeps the newer one above
        "project_oid": "c1",
        "project_name": "Khu đô thị Phú Mỹ Hưng (cũ)",
        "region_name": "Hồ Chí Minh",
        "geo": "10.7340,106.7215",
        "sell_price_lower": 2_400_000_000.0,
        "facilities": "[\"pool\"]",
        "timestamp": "2024-01-09T08:00:00",
        "spider_name": "chotot_api",
        "process_run_id": "run0",
    },
    {   # quarantine: missing project_name
        "project_oid": "c2",
        "region_name": "Sài Gòn",
        "geo": "not-a-geo",
        "timestamp": "2024-01-10T09:00:00",
        "spider_name": "chotot_api",
        "process_run_id": "run1",
    },
    {   # out-of-range latitude -> quarantine
        "project_oid": "c3",
        "project_name": "Dự án X",
        "region_name": "TP Đà Nẵng",
        "geo": "95.0,190.0",
        "sell_price_lower": 1_000_000_000.0,
        "facilities": "pool",
        "timestamp": "2024-01-10T10:00:00",
        "spider_name": "chotot_api",
        "process_run_id": "run1",
    },
    {   # price outlier (will be z-score nulled when sigma small)
        "project_oid": "c4",
        "project_name": "Dự án Y",
        "region_name": "Hà Nội",
        "geo": "21.0285,105.8542",
        "sell_price_lower": 3_000_000_000.0,
        "sell_price_higher": 6_000_000_000.0,
        "timestamp": "2024-01-10T11:00:00",
        "spider_name": "chotot_api",
        "process_run_id": "run1",
    },
]

MEEY_ROWS = [
    {
        "_id": "m1",
        "name": "Vinhomes Smart City",
        "description": "Đại đô thị thông minh với <br> công viên, an ninh 24/7",
        "address": "Nam Từ Liêm",
        "location": {"type": "Point", "coordinates": [105.7905, 21.0362]},
        "ward": {"translation": [{"name": "Tây Mỗ"}]},
        "district": {"translation": [{"name": "Nam Từ Liêm"}]},
        "city": {"translation": [{"name": "Hà Nội"}]},
        "totalArea": 2800000.0,
        "lowestPriceByProduct": 1_200_000_000.0,
        "highestPriceByProduct": 9_000_000_000.0,
        "totalBuilding": 58,
        "totalFloor": 35,
        "totalApartment": 40000,
        "investorRelated": {"investor": {"name": "Vingroup"}},
        "utilities": {"basicUtilities": ["park", "school"]},
        "images": [{"url": "http://img/vsc1.jpg"}, {"url": "http://img/vsc2.jpg"}],
        "timestamp": "2024-01-10T08:30:00",
        "spider_name": "meeyproject_api",
        "process_run_id": "run1",
    },
    {   # short coordinates array -> N5 guard -> null lat/lon
        "_id": "m2",
        "name": "Meey Tower",
        "location": {"type": "Point", "coordinates": [105.8]},
        "city": {"translation": [{"name": "TP Hà Nội"}]},
        "lowestPriceByProduct": 2_000_000_000.0,
        "timestamp": "2024-01-10T08:45:00",
        "spider_name": "meeyproject_api",
        "process_run_id": "run1",
    },
]

ONEHOUSING_ROWS = [
    {
        "id": "o1",
        "name": "Masteri Centre Point",
        "description": "Can ho cao cap co ho boi va phong gym",
        "address": "Long Bình",
        "ward": "Long Bình",
        "district": "Quận 9",
        "city": "Hồ Chí Minh",
        "lat_cdnt": 10.8411,
        "long_cdnt": 106.8276,
        "total_area": 2.5,  # hectares -> 25000 m2
        "blocks": 6,
        "total_property": 5000,
        "number_living_floor": 30,
        "min_selling_price": 2_800_000_000.0,
        "max_selling_price": 7_000_000_000.0,
        "developer_name": "Masterise Homes",
        "insight_by_bedroom": [
            {"number_of_bedroom": "1", "min_price": 2.8e9, "max_price": 3.5e9,
             "min_carpet_area": 50.0, "max_carpet_area": 55.0},
            {"number_of_bedroom": "2", "min_price": 3.6e9, "max_price": 4.8e9,
             "min_carpet_area": 70.0, "max_carpet_area": 80.0},
        ],
        "quality_indexes": [{"name": "air", "value": "good"}, {"name": "noise", "value": "low"}],
        "albums": [{"name": "a", "images": ["http://img/m1.jpg", "http://img/m2.jpg"]}],
        "handover_date_from": 1648771200000,  # unix millis -> D2
        "timestamp": "2024-01-10T09:15:00",
        "spider_name": "onehousing_api",
        "process_run_id": "run1",
    },
    {
        "id": "o2",
        "name": "Eco Green",
        "district": "Quận 7",
        "city": "Hồ Chí Minh",
        "lat_cdnt": 10.7340,
        "long_cdnt": 106.7215,
        "total_area": 1.4,
        "handover_date_from": "2022-04-01",  # ISO string -> D2 other branch
        "timestamp": "2024-01-10T09:20:00",
        "spider_name": "onehousing_api",
        "process_run_id": "run1",
    },
]


def write_bronze(tmpdir: str) -> str:
    """Write the fixture rows as JSONL files (one per source) and return
    the glob-able directory."""
    os.makedirs(tmpdir, exist_ok=True)
    for name, rows in [
        ("chotot_api", CHOTOT_ROWS),
        ("meeyproject_api", MEEY_ROWS),
        ("onehousing_api", ONEHOUSING_ROWS),
    ]:
        with open(os.path.join(tmpdir, f"{name}.jsonl"), "w", encoding="utf-8") as fh:
            for r in rows:
                fh.write(json.dumps(r, ensure_ascii=False) + "\n")
    return tmpdir
