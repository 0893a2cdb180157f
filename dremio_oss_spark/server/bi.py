"""BI-tool connect files: Tableau .tds and Power BI .pbids per dataset.

Reference: `dac/backend/.../resource/TableauResource.java:44` +
`PowerBIResource.java` over `BaseBIToolResource.java` — each dataset
page offers "Open in Tableau / Power BI", served as a small connection
file the BI tool opens to connect straight back to the engine
(`TableauMessageBodyGenerator.java:305-560` writes the TDS XML;
`PowerBIMessageBodyGenerator.java:47-230` the PBIDS JSON).

Spark-first twist: the connection target is this repo's Arrow
FlightSQL endpoint (the modern Tableau/Power BI Dremio connectors speak
Flight SQL), so the files point `server:port` at the Flight server the
caller names.  Output is deterministic for a given (dataset, host,
port) — golden-file tested."""

from __future__ import annotations

from xml.sax.saxutils import quoteattr

TABLEAU_VERSION = "18.1"  # TableauMessageBodyGenerator TABLEAU_VERSION


def _split_dataset(dataset: str) -> tuple[str, str]:
    """schema (parent path) + leaf name, Dremio-style: the last dotted
    segment is the table, everything before it the schema."""
    if "." in dataset:
        schema, _, name = dataset.rpartition(".")
        return schema, name
    return "", dataset


def tableau_tds(dataset: str, host: str, port: int) -> str:
    """The .tds datasource XML (TableauMessageBodyGenerator.java:305:
    <datasource inline=true version=...> wrapping one <connection> with
    a <relation> for the dataset).  class follows the generator's
    genericodbc arm with the driver name swapped for the Flight SQL
    ODBC driver this engine serves."""
    schema, name = _split_dataset(dataset)
    table_ref = (f"[{schema}].[{name}]" if schema else f"[{name}]")
    return (
        "<?xml version='1.0' encoding='utf-8'?>\n"
        f"<datasource inline='true' version='{TABLEAU_VERSION}'>\n"
        "  <connection class='genericodbc' dbname='DREMIO'"
        " odbc-dbms-name='Dremio'"
        " odbc-driver='Arrow Flight SQL ODBC Driver'"
        " odbc-dsn=''"
        f" schema={quoteattr(schema)}"
        f" port={quoteattr(str(port))}"
        f" server={quoteattr(host)} username=''>\n"
        f"    <relation name={quoteattr(name)} type='table'"
        f" table={quoteattr(table_ref)} />\n"
        "  </connection>\n"
        "  <aliases enabled='yes' />\n"
        "</datasource>\n"
    )


def powerbi_pbids(dataset: str, host: str, port: int) -> dict:
    """The .pbids DSR document (PowerBIMessageBodyGenerator.java:55-151:
    version 0.1, one DirectQuery connection whose address carries
    server + object)."""
    schema, name = _split_dataset(dataset)
    return {
        "version": "0.1",
        "connections": [{
            "details": {
                "protocol": "dremio",
                "address": {
                    "server": f"{host}:{port}",
                    "schema": schema,
                    "object": name,
                },
            },
            "mode": "DirectQuery",
        }],
    }
