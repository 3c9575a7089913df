"""Streaming operators (Structured Streaming twins of the batch
plans) plus the one shared harness utility every bounded
(``availableNow``) run needs: :func:`await_or_raise`."""


def await_or_raise(query, timeout_sec: float) -> None:
    """``awaitTermination`` that FAILS LOUDLY on timeout.

    ``StreamingQuery.awaitTermination(t)`` returns ``False`` when the
    query is still running after ``t`` seconds — silently proceeding
    past that reads a partial sink and returns stale totals with no
    error.  Every bounded run in this repo goes through here: on
    timeout the query is stopped and a ``TimeoutError`` is raised so
    the caller can never mistake a half-finished stream for a result.
    """
    if not query.awaitTermination(timeout_sec):
        try:
            query.stop()
        finally:
            raise TimeoutError(
                f"streaming query {query.name or query.id} did not "
                f"terminate within {timeout_sec}s; sink contents would "
                f"be partial"
            )
