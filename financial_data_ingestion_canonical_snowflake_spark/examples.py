"""Example pipeline source files per FIXTURES.md §A: tri-format transaction
files with intentional defects (duplicates, missing required fields,
negatives, nesting variance, drifting keys, malformed files).

Used by the end-to-end tests and by the driver-facing
``pipeline_e2e_*`` demo queries (plans/parity_pipeline.py)."""

from __future__ import annotations

import os
import textwrap


def write_fixtures(root: str) -> str:
    os.makedirs(f"{root}/client_a/xml", exist_ok=True)
    os.makedirs(f"{root}/client_a/csv", exist_ok=True)
    os.makedirs(f"{root}/client_c/json", exist_ok=True)
    os.makedirs(f"{root}/client_c/csv", exist_ok=True)

    # ---- XML (ClientA) -------------------------------------------------
    xml = {
        # id as attribute; negative header amount; line with BOTH negative
        # qty and negative amount (must yield only NEGATIVE_QTY)
        "txn_2001.xml": """
            <transaction transaction_id="TXN-2001">
              <transaction_ts>2026-01-15T11:00:00</transaction_ts>
              <currency>eur</currency>
              <total_amount>-50.00</total_amount>
              <customer><id>CUST-2</id></customer>
              <account_id>ACC-3</account_id>
              <merchant><name>Globex</name></merchant>
              <line_items>
                <line>
                  <line_number>1</line_number>
                  <item_id>SKU-9</item_id>
                  <description>Gadget</description>
                  <quantity>-1</quantity>
                  <unit_price>50.00</unit_price>
                  <line_amount>-50.00</line_amount>
                </line>
              </line_items>
            </transaction>""",
        # id as child element; two lines; clean
        "txn_2002.xml": """
            <transaction>
              <transaction_id>TXN-2002</transaction_id>
              <transaction_ts>2026-01-16T09:30:00</transaction_ts>
              <currency>usd</currency>
              <total_amount>120.00</total_amount>
              <customer_id>CUST-7</customer_id>
              <account_id>ACC-1</account_id>
              <merchant>Initech</merchant>
              <line_items>
                <line><line_number>1</line_number><item_id>SKU-1</item_id>
                  <quantity>2</quantity><unit_price>30.00</unit_price><line_amount>60.00</line_amount></line>
                <line><line_number>2</line_number><item_id>SKU-2</item_id>
                  <quantity>3</quantity><unit_price>20.00</unit_price><line_amount>60.00</line_amount></line>
              </line_items>
            </transaction>""",
        # missing timestamp -> MISSING_REQUIRED; single <line> (object, not
        # array -- exercises the single-element flatten wrap); items/item path
        "txn_2003.xml": """
            <transaction>
              <txn_id>TXN-2003</txn_id>
              <ccy>gbp</ccy>
              <total>75.50</total>
              <customer_id>CUST-9</customer_id>
              <items>
                <item><item_id>SKU-5</item_id><qty>1</qty><price>75.50</price><amount>75.50</amount></item>
              </items>
            </transaction>""",
        # duplicate of TXN-2002 (same batch -> payload_hash tiebreaker decides
        # the survivor; both rows flagged DUPLICATE_TXN). Lines identical to
        # txn_2002.xml so faithful/row join modes agree on line values.
        "txn_2004_dup.xml": """
            <transaction>
              <transaction_id>TXN-2002</transaction_id>
              <transaction_ts>2026-01-16T10:00:00</transaction_ts>
              <currency>usd</currency>
              <total_amount>120.00</total_amount>
              <customer_id>CUST-7</customer_id>
              <account_id>ACC-1</account_id>
              <merchant>Initech</merchant>
              <line_items>
                <line><line_number>1</line_number><item_id>SKU-1</item_id>
                  <quantity>2</quantity><unit_price>30.00</unit_price><line_amount>60.00</line_amount></line>
                <line><line_number>2</line_number><item_id>SKU-2</item_id>
                  <quantity>3</quantity><unit_price>20.00</unit_price><line_amount>60.00</line_amount></line>
              </line_items>
            </transaction>""",
        # fully clean transaction -> is_valid = true
        "txn_2005.xml": """
            <transaction transaction_id="TXN-2005">
              <transaction_ts>2026-01-20T10:00:00</transaction_ts>
              <currency>eur</currency>
              <total_amount>15.00</total_amount>
              <customer_id>CUST-2</customer_id>
              <account_id>ACC-3</account_id>
              <merchant><name>Globex</name></merchant>
              <line_items>
                <line><line_number>1</line_number><item_id>SKU-14</item_id>
                  <quantity>1</quantity><unit_price>15.00</unit_price><line_amount>15.00</line_amount></line>
              </line_items>
            </transaction>""",
    }
    for name, body in xml.items():
        with open(f"{root}/client_a/xml/{name}", "w") as f:
            f.write(textwrap.dedent(body).strip() + "\n")

    # ---- JSON (ClientC) ------------------------------------------------
    json_files = {
        # canonical keys + extra field + line without line_number (index
        # fallback) + line without currency (header fallback)
        "txn_1001.json": """
            {"transaction_id": "TXN-1001", "transaction_ts": "2026-01-15T10:30:00",
             "currency": "usd", "total_amount": "125.500", "customer_id": "CUST-9",
             "account_id": "ACC-7", "merchant": "Acme",
             "unexpected_field": "kept-in-attributes",
             "line_items": [
               {"line_number": 1, "line_id": "L-1", "item_id": "SKU-1",
                "description": "Widget", "quantity": "2", "unit_price": "10.25",
                "line_amount": "20.50", "currency": "USD"},
               {"item_id": "SKU-2", "description": "Cog", "quantity": "5",
                "unit_price": "21.00", "line_amount": "105.00"}
             ]}""",
        # drifted keys: txn_id / transaction_time / ccy / amount /
        # customerId / payee / items / sku / qty
        "txn_1002.json": """
            {"txn_id": "TXN-1002", "transaction_time": "2026-01-15T14:00:00",
             "ccy": "eur", "amount": 42, "customerId": "CUST-3", "payee": "Umbrella",
             "items": [{"sku": "SKU-3", "name": "Bolt", "qty": "10",
                        "price": "4.20", "total": "42.00"}]}""",
        # top-level array (STRIP_OUTER_ARRAY): two transactions in one file.
        # Both header-only: a multi-txn file with lines would trigger the
        # reference's file-granular J1 fan-out (SURVEY §7.4-2), which the
        # faithful/row mode comparison covers via the CSV fixtures instead.
        "txn_1003.json": """
            [{"transaction_id": "TXN-1003a", "transaction_ts": "2026-01-17T08:00:00",
              "currency": "usd", "total_amount": "10.00", "customer_id": "CUST-1"},
             {"transaction_id": "TXN-1003b", "transaction_ts": "2026-01-17T08:05:00",
              "currency": "usd", "total_amount": "20.00", "customer_id": "CUST-1"}]""",
        # no id anywhere -> payload-hash fallback id; missing amount ->
        # MISSING_REQUIRED; nested customer.id variant
        "txn_1004.json": """
            {"transaction_ts": "2026-01-18T12:00:00", "currency": "usd",
             "customer": {"id": "CUST-4"}, "merchant": {"name": "Hooli"}}""",
        # duplicate pair: same transaction_id in two files
        "txn_1005.json": """
            {"transaction_id": "TXN-1005", "transaction_ts": "2026-01-19T09:00:00",
             "currency": "usd", "total_amount": "5.00", "customer_id": "CUST-5"}""",
        "txn_1005_dup.json": """
            {"transaction_id": "TXN-1005", "transaction_ts": "2026-01-19T09:00:00",
             "currency": "usd", "total_amount": "6.00", "customer_id": "CUST-5"}""",
        # malformed -> ON_ERROR='CONTINUE' audit row with errors_seen=1
        "txn_bad.json": '{"transaction_id": "TXN-BAD", unquoted: oops',
    }
    for name, body in json_files.items():
        with open(f"{root}/client_c/json/{name}", "w") as f:
            f.write(textwrap.dedent(body).strip() + "\n")

    # ---- CSV (both clients) ---------------------------------------------
    header = (
        "source_txn_id,txn_timestamp,currency,total_amount,customer_id,"
        "account_id,merchant,item_id,description,quantity,unit_price,"
        "line_amount,line_currency"
    )
    csv_a = [
        header,
        "TXN-3001,2026-01-15T12:00:00,gbp,75.00,CUST-5,ACC-1,Initech,SKU-4,Gizmo,3,25.00,75.00,",
        # negative amount + negative line amount (qty positive ->
        # NEGATIVE_AMOUNT_LINE on the line)
        "TXN-3002,2026-01-15T13:00:00,gbp,-75.00,CUST-5,ACC-1,Initech,SKU-4,Gizmo,3,25.00,-75.00,",
        # garbage timestamp -> MISSING_REQUIRED; negative qty -> NEGATIVE_QTY
        "TXN-3003,not-a-time,gbp,30.00,CUST-6,ACC-2,Stark,SKU-8,Arc,-3,10.00,30.00,",
        # duplicate business key within one file
        "TXN-3001,2026-01-15T12:00:00,gbp,75.00,CUST-5,ACC-1,Initech,SKU-4,Gizmo,3,25.00,75.00,",
        # header-only row: 7/8/11 all empty -> no line emitted
        "TXN-3004,2026-01-15T15:00:00,gbp,99.00,CUST-7,ACC-3,Wayne,,,,,,",
        # ragged row (3 of 13 tokens) -> ON_ERROR='CONTINUE' rejects it
        # (Snowflake ERROR_ON_COLUMN_COUNT_MISMATCH): PARTIALLY_LOADED audit
        # with errors_seen=1, row never reaches the raw table
        "TXN-3099,2026-01-15T16:00:00,gbp",
    ]
    csv_c = [
        header,
        # empty header currency + col-12 override -> line currency from
        # position 12 (payload[2] NULL, payload[12]='CAD')
        "TXN-3006,2026-01-16T10:00:00,,55.00,CUST-8,ACC-9,Oscorp,SKU-11,Web,1,55.00,55.00,CAD",
        # unparsable amount -> MISSING_REQUIRED
        "TXN-3005,2026-01-16T11:00:00,usd,abc,CUST-8,ACC-9,Oscorp,SKU-12,Net,2,5.00,10.00,",
    ]
    with open(f"{root}/client_a/csv/transactions.csv", "w") as f:
        f.write("\n".join(csv_a) + "\n")
    with open(f"{root}/client_c/csv/transactions.csv", "w") as f:
        f.write("\n".join(csv_c) + "\n")
    return root
