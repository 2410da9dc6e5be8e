"""Deterministic ETL fixtures (FIXTURES.md §§1-3).

Shapes mirror exactly what the reference consumes: Insights records
with all-string scalars and optional actions/conversions lists
(reference main.py:190-216), currencylayer success/error envelopes
(reference main.py:132-143). Used by both the pytest suite and the
driver-checked ETL-parity queries (plans/etl_parity.py), which render
the SAME constants into DuckDB VALUES literals.
"""

from __future__ import annotations


def _rec(
    date: str,
    ad: int,
    adset: int,
    campaign: int,
    campaign_name: str,
    clicks: str,
    impressions: str,
    spend: str,
    actions: list[dict] | None = None,
    conversions: list[dict] | None = None,
) -> dict:
    rec = {
        "date_start": date,
        "ad_id": str(ad),
        "ad_name": f"ad_{ad}",
        "adset_id": str(adset),
        "adset_name": f"adset_{adset}",
        "campaign_id": str(campaign),
        "campaign_name": campaign_name,
        "clicks": clicks,
        "impressions": impressions,
        "spend": spend,
    }
    # Facebook omits the keys entirely when an ad has no actions —
    # modeled as absent keys here (→ NULL columns in the raw frame).
    if actions is not None:
        rec["actions"] = actions
    if conversions is not None:
        rec["conversions"] = conversions
    return rec


def _a(action_type: str, value: str) -> dict:
    return {"action_type": action_type, "value": value}


# 2 days × 2 campaigns; covers: both lists present / one missing /
# both missing / empty lists / multi-element lists / zero-metric row /
# REQUIRED-violating row (unparseable clicks → quarantine).
FB_FIXTURE: list[dict] = [
    _rec("2025-01-01", 1001, 201, 31, "Brand", "42", "1000", "12.34",
         actions=[_a("link_click", "30"), _a("page_view", "55")],
         conversions=[_a("purchase", "3")]),
    _rec("2025-01-01", 1002, 201, 31, "Brand", "17", "820", "9.50"),
    _rec("2025-01-01", 1003, 202, 31, "Brand", "5", "150", "1.25",
         actions=[], conversions=[]),
    _rec("2025-01-01", 2001, 301, 32, "Performance", "88", "2400", "33.10",
         actions=[_a("link_click", "61")]),
    _rec("2025-01-02", 1001, 201, 31, "Brand", "39", "940", "11.80",
         actions=[_a("link_click", "28"), _a("page_view", "49"), _a("video_view", "12")],
         conversions=[_a("purchase", "2"), _a("add_to_cart", "7")]),
    _rec("2025-01-02", 2001, 301, 32, "Performance", "91", "2500", "35.75",
         actions=[_a("link_click", "66")], conversions=[_a("purchase", "5")]),
    _rec("2025-01-02", 2002, 302, 32, "Performance", "0", "10", "0.0"),
    # REQUIRED violation: clicks not numeric → row must be quarantined,
    # never written (BigQuery would reject it at insert time).
    _rec("2025-01-02", 9999, 999, 99, "Broken", "oops", "100", "1.00"),
]

FX_FIXTURE: list[dict] = [
    {"date": "2025-01-01", "currencies": "USDUAH", "rate": 41.10},
    {"date": "2025-01-02", "currencies": "USDUAH", "rate": 42.35},
]

CURRENCYLAYER_OK = {"success": True, "quotes": {"USDUAH": 41.25}}
CURRENCYLAYER_ERR = {"success": False, "error": {"info": "invalid access key"}}

PUBSUB_FACEBOOK_EVENT = {
    "data": "Z2V0X2ZhY2Vib29r",  # base64('get_facebook')
    "attributes": {
        "project_id": "proj", "dataset_id": "ds", "table_id": "fb_stat",
    },
}
PUBSUB_CURRENCY_BACKFILL_EVENT = {
    "data": "Z2V0X2N1cnJlbmN5",  # base64('get_currency')
    "attributes": {"date": "2025-01-01", "from_currency": "USD", "to_currency": "UAH"},
}


def fb_scalar_values_sql() -> str:
    """Render FB_FIXTURE's scalar fields as a DuckDB VALUES literal
    (actions/conversions omitted)."""
    rows = []
    for r in FB_FIXTURE:
        rows.append(
            "('{date_start}', '{campaign_id}', '{campaign_name}', "
            "'{clicks}', '{impressions}', '{spend}')".format(**r)
        )
    return (
        "(VALUES " + ", ".join(rows)
        + ") t(date_start, campaign_id, campaign_name, clicks, impressions, spend)"
    )


def _actions_literal(actions: list[dict] | None) -> str:
    if actions is None:
        return "NULL"
    if not actions:
        return "[]"
    items = ", ".join(
        "{{'action_type': '{action_type}', 'value': '{value}'}}".format(**a) for a in actions
    )
    return f"[{items}]"


def fb_actions_values_sql() -> str:
    """FB_FIXTURE with the nested actions list as DuckDB list-of-struct
    literals (NULL when the key is absent — the reference's missing-key
    case, main.py:195)."""
    rows = []
    for r in FB_FIXTURE:
        rows.append(
            "('{d}', '{c}', '{cl}', {a})".format(
                d=r["date_start"], c=r["campaign_name"], cl=r["clicks"],
                a=_actions_literal(r.get("actions")),
            )
        )
    return "(VALUES " + ", ".join(rows) + ") t(date_start, campaign_name, clicks, actions)"


def fb_roas_values_sql() -> str:
    """FB_FIXTURE rows with spend AND the nested actions list — the
    shape the ROAS query needs (joining the scalar and actions VALUES
    tables would misalign rows sharing (date, campaign))."""
    rows = []
    for r in FB_FIXTURE:
        rows.append(
            "('{d}', '{c}', '{cl}', '{imp}', '{s}', {a})".format(
                d=r["date_start"], c=r["campaign_name"], cl=r["clicks"],
                imp=r["impressions"], s=r["spend"],
                a=_actions_literal(r.get("actions")),
            )
        )
    return (
        "(VALUES " + ", ".join(rows)
        + ") t(date_start, campaign_name, clicks, impressions, spend, actions)"
    )


def fx_values_sql() -> str:
    rows = ", ".join(
        "('{date}', '{currencies}', {rate})".format(**r) for r in FX_FIXTURE
    )
    return f"(VALUES {rows}) fx(date_str, currencies, rate)"
