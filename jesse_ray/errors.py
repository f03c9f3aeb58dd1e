"""Error-atom constants — the behavioral contract shared with the reference.

These names mirror the data-error atoms the reference validator emits
(reference: src/jesse_schema_validator.hrl:123-151 and
src/jesse_error.erl:39-54).  Violation rows produced by this engine use
the same strings in their ``error`` column so that a consumer of the
reference's error records can read ours unchanged.
"""

# --- data errors (per-row / per-value) ---
DATA_INVALID = "data_invalid"
MISSING_REQUIRED_PROPERTY = "missing_required_property"
MISSING_DEPENDENCY = "missing_dependency"
NO_MATCH = "no_match"
NO_EXTRA_PROPERTIES_ALLOWED = "no_extra_properties_allowed"
NO_EXTRA_ITEMS_ALLOWED = "no_extra_items_allowed"
NOT_ALLOWED = "not_allowed"
NOT_UNIQUE = "not_unique"
NOT_IN_ENUM = "not_in_enum"
NOT_IN_RANGE = "not_in_range"
NOT_DIVISIBLE = "not_divisible"
WRONG_TYPE = "wrong_type"
WRONG_SIZE = "wrong_size"
WRONG_LENGTH = "wrong_length"
WRONG_FORMAT = "wrong_format"
TOO_MANY_PROPERTIES = "too_many_properties"
TOO_FEW_PROPERTIES = "too_few_properties"
ALL_SCHEMAS_NOT_VALID = "all_schemas_not_valid"
ANY_SCHEMAS_NOT_VALID = "any_schemas_not_valid"
NOT_MULTIPLE_OF = "not_multiple_of"
NOT_ONE_SCHEMA_VALID = "not_one_schema_valid"
MORE_THAN_ONE_SCHEMA_VALID = "more_than_one_schema_valid"
NOT_SCHEMA_VALID = "not_schema_valid"
EXTERNAL = "external"
# engine extension (draft-7-style if/then/else, beyond the reference)
CONDITIONAL_NOT_VALID = "conditional_not_valid"

# --- schema errors (spec-compile-time; raised on the driver) ---
SCHEMA_INVALID = "schema_invalid"
WRONG_REQUIRED_ARRAY = "wrong_required_array"
WRONG_MULTIPLE_OF = "wrong_multiple_of"
WRONG_TYPE_SPECIFICATION = "wrong_type_specification"


class SchemaInvalidError(ValueError):
    """Raised at spec-compile time for malformed specs.

    Mirrors the reference's ``{schema_invalid, Schema, ErrorType}``
    3-tuple (reference: src/jesse_error.erl:98-103): schema-side
    failures abort before any data-plane work is launched.
    """

    def __init__(self, error_atom: str, detail: str = ""):
        self.error_atom = error_atom
        super().__init__(f"{error_atom}: {detail}" if detail else error_atom)


#: All data-error atoms this engine can emit (for test assertions).
DATA_ERROR_ATOMS = frozenset(
    {
        MISSING_REQUIRED_PROPERTY,
        MISSING_DEPENDENCY,
        NO_MATCH,
        NOT_ALLOWED,
        NOT_UNIQUE,
        NOT_IN_ENUM,
        NOT_IN_RANGE,
        NOT_DIVISIBLE,
        WRONG_TYPE,
        WRONG_SIZE,
        WRONG_LENGTH,
        WRONG_FORMAT,
        ALL_SCHEMAS_NOT_VALID,
        ANY_SCHEMAS_NOT_VALID,
        NOT_MULTIPLE_OF,
        NOT_ONE_SCHEMA_VALID,
        MORE_THAN_ONE_SCHEMA_VALID,
        NOT_SCHEMA_VALID,
        EXTERNAL,
    }
)
