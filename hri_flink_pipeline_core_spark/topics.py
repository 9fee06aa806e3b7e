"""Ingest topic-name derivation and validation.

Reference semantics (BaseValidationJob.scala:56-75,297-311 and
BaseValidationJobPropertiesTest.scala:32-111): the input topic must match
``ingest.<tenant>.<dataIntegrator>[.<qualifier>].in``; siblings ``.out``,
``.invalid``, ``.notification`` are derived by suffix replacement, and
tenantId is path segment 2. Anything else raises TopicNamingException.
"""

from __future__ import annotations

from dataclasses import dataclass


class TopicNamingException(ValueError):
    """Raised for input topics not matching ingest.<tenant>.<di>[.q].in
    (reference: TopicNamingException.scala:9)."""


IN_SUFFIX = ".in"
PREFIX = "ingest."


@dataclass(frozen=True)
class TopicSet:
    input_topic: str
    output_topic: str
    invalid_topic: str
    notification_topic: str
    tenant_id: str


def derive_topics(input_topic: str) -> TopicSet:
    if not input_topic.startswith(PREFIX):
        raise TopicNamingException(
            f"The Input Topic name {input_topic} does not start with '{PREFIX}'"
        )
    if not input_topic.endswith(IN_SUFFIX):
        raise TopicNamingException(
            f"The Input Topic name {input_topic} does not end with '{IN_SUFFIX}'"
        )
    base = input_topic[: -len(IN_SUFFIX)]
    segments = input_topic.split(".")
    # ingest.<tenant>.<di>.in = 4 segments; optional qualifier -> 5.
    if len(segments) < 4 or any(not s for s in segments):
        raise TopicNamingException(
            f"The Input Topic name {input_topic} must have 4 or 5 segments: "
            "ingest.<tenant>.<dataIntegrator>[.<qualifier>].in"
        )
    tenant = segments[1]
    return TopicSet(
        input_topic=input_topic,
        output_topic=base + ".out",
        invalid_topic=base + ".invalid",
        notification_topic=base + ".notification",
        tenant_id=tenant,
    )
