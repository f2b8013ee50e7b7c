"""Error-classification helpers shared by sources/sinks/job."""

from __future__ import annotations

from pyspark.sql.utils import AnalysisException


def is_path_not_found(e: AnalysisException) -> bool:
    """True only for missing-input errors (PATH_NOT_FOUND / empty glob).

    Absence of input is the ONLY error the load may interpret as "nothing
    to do" (reference: hfpTask.ts:88-95 skips on an empty blob listing);
    corrupt footers, permission denials, etc. must propagate.
    """
    get_cond = getattr(e, "getCondition", None) or getattr(
        e, "getErrorClass", lambda: None
    )
    cls = get_cond() or ""
    return "PATH_NOT_FOUND" in cls or "PATH_NOT_FOUND" in str(e)
