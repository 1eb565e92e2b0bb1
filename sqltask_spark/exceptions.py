"""Task-level exceptions.

Parity with ``reference sqltask/base/exceptions.py:1-14``: the
reference defines ``TooFewRowsException`` (raised by user
``validate()`` hooks to abort the ETL before the destructive
delete+insert step) and ``ExecutionArgumentException``. We add
``MandatoryValueMissingException`` for the strict-mode completeness
check (reference dev-mode check at ``sqltask/base/table.py:392-397``).
"""

from __future__ import annotations


class SqlTaskSparkException(Exception):
    """Base class for engine exceptions."""


class TooFewRowsException(SqlTaskSparkException):
    """Validation found fewer rows than required; write phase aborted."""


class ExecutionArgumentException(SqlTaskSparkException):
    """Invalid batch/execution arguments."""


class MandatoryValueMissingException(SqlTaskSparkException):
    """A non-nullable target column contains NULLs at write time."""


class SchemaMigrationException(SqlTaskSparkException):
    """Schema migration could not reconcile declared vs. live schema."""


class DuplicateNameException(SqlTaskSparkException):
    """A table/source/lookup name was registered twice.

    Parity: reference raises bare ``Exception`` on duplicate names
    (``sqltask/__init__.py:35-38``); a typed error is strictly better.
    """


class UnknownNameException(SqlTaskSparkException):
    """A table/source/lookup name was never registered."""
