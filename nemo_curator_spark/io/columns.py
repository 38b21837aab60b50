"""Column-name plumbing shared by readers/iterators — reference
utils/column_utils.py:16-36."""

from __future__ import annotations


def resolve_filename_column(add_filename_column: bool | str) -> str | None:
    """column_utils.py:16-36, exact: True -> the default ``file_name``,
    False -> None, a string names the column, anything else raises."""
    if add_filename_column is True:
        return "file_name"
    if add_filename_column is False:
        return None
    if isinstance(add_filename_column, str):
        return add_filename_column
    msg = f"Invalid value for add_filename_column: {add_filename_column}"
    raise ValueError(msg)
