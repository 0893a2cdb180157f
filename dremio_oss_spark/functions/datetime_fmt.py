"""Dremio/SQL-style datetime format-string translation.

The reference maps SQL-style format tokens (YYYY, DD, HH24, MI, ...) to
Joda patterns at plan time (dremio-oss
`sabot/kernel/.../expr/fn/impl/DateFunctionsUtils.java`, used by
TO_CHAR/TO_DATE/TO_TIMESTAMP — `DateToCharFunctions.java`).  Spark's
`date_format`/`to_timestamp` speak java.time patterns, so we translate the
same token table Dremio documents to java.time equivalents.

Translation is plan-time (the format string is a literal), so this costs
nothing at execution scale.
"""

from __future__ import annotations

# longest-match-first token table: Dremio SQL token -> java.time pattern
_TOKENS: list[tuple[str, str]] = [
    ("YYYY", "yyyy"),
    ("YY", "yy"),
    ("MONTH", "MMMM"),
    ("MON", "MMM"),
    ("MM", "MM"),
    ("DDD", "DDD"),
    ("DD", "dd"),
    ("DAY", "EEEE"),
    ("DY", "EEE"),
    ("HH24", "HH"),
    ("HH12", "hh"),
    ("HH", "hh"),
    ("MI", "mm"),
    ("SS", "ss"),
    ("FFF", "SSS"),
    ("AMPM", "a"),
    ("TZD", "z"),
    ("TZO", "xxx"),
    ("WW", "ww"),
    ("W", "W"),
    ("Q", "Q"),
    ("EPOCH", "epoch"),  # handled by callers via unix_timestamp
]


def dremio_to_spark_format(fmt: str) -> str:
    """Translate a Dremio-style datetime format string to java.time.

    Unknown alphabetic runs are single-quoted so java.time treats them as
    literals (Dremio treats unrecognized letters as literals too).
    """
    out: list[str] = []
    i = 0
    n = len(fmt)
    while i < n:
        ch = fmt[i]
        if ch == '"':  # Dremio quoted literal -> java.time single-quoted
            j = fmt.find('"', i + 1)
            j = n if j < 0 else j
            lit = fmt[i + 1 : j]
            out.append("'" + lit.replace("'", "''") + "'")
            i = j + 1
            continue
        matched = False
        if ch.isalpha():
            for tok, rep in _TOKENS:
                if fmt.upper().startswith(tok, i):
                    out.append(rep)
                    i += len(tok)
                    matched = True
                    break
            if not matched:
                # single unrecognized LETTER -> literal (Dremio resumes
                # token matching on the next char; swallowing the whole
                # run ate valid tokens, e.g. the HH24 in ...DDTHH24:MI)
                out.append("'" + ch + "'")
                i += 1
            continue
        out.append(ch)
        i += 1
    return "".join(out)
