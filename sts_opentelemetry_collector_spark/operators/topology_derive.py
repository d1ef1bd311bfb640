"""A7: OTel resource-attrs -> topology components/relations derivation
cascade.

Reference: exporter/ststopologyexporter/internal/topology.go:29-198
(AddResource / addHostResource / addKubernetesRelation):

- no service.name            => resource skipped entirely (returns false)
- namespace  = service.namespace | 'default'
  component  urn:opentelemetry:namespace/{ns}                 type namespace
- service    urn:opentelemetry:namespace/{ns}:service/{name}  type service
- instance   id = service.instance.id | service.name
  name       = "{service} - {id}"  (or "{service} - instance" when defaulted)
  component  {service_urn}:serviceInstance/{id}         type service-instance
  relation   service -> instance                              'provided-by'
- host.id | faas.id | aws.ecs.task.id (ELIF precedence, first present wins):
  component  urn:opentelemetry:{host|function|task}/{id}
  relation   that component -> instance                       'executes'
- k8s.{cluster,namespace,pod}.name (ALL required, else skipped):
  component  urn:opentelemetry:kubernetes:/{cl}:{ns}:pod/{pod}     type pod
  relation   pod -> instance                             'kubernetes-to-otel'

Spark shape: ONE projection builds an array of candidate component structs
and one of relation structs per resource row, explodes, and de-duplicates
by external_id (the reference's map-keyed collection; duplicate rows are
bit-identical because every field is a function of the external_id's own
inputs, so distinct() is deterministic). No joins, no UDFs: the whole
cascade is codegen'd when-expressions, scale-limited only by the final
dedup shuffle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

REQUIRED_ATTRS = ["service_name"]


def derive_components(resources: DataFrame) -> DataFrame:
    """Components from resource attrs. Input columns: service_name,
    service_namespace, service_instance_id, host_id, faas_id, ecs_task_id,
    k8s_cluster, k8s_namespace, k8s_pod (all nullable strings)."""
    r = resources.where(F.col("service_name").isNotNull())
    ns = F.coalesce(F.col("service_namespace"), F.lit("default"))
    ns_urn = F.concat(F.lit("urn:opentelemetry:namespace/"), ns)
    svc_urn = F.concat(ns_urn, F.lit(":service/"), F.col("service_name"))
    inst_id = F.coalesce(F.col("service_instance_id"), F.col("service_name"))
    inst_urn = F.concat(svc_urn, F.lit(":serviceInstance/"), inst_id)
    inst_name = F.when(
        F.col("service_instance_id").isNotNull(),
        F.concat(F.col("service_name"), F.lit(" - "), F.col("service_instance_id")),
    ).otherwise(F.concat(F.col("service_name"), F.lit(" - instance")))

    host_like = _host_like_urn()
    k8s_ok = (
        F.col("k8s_cluster").isNotNull()
        & F.col("k8s_namespace").isNotNull()
        & F.col("k8s_pod").isNotNull()
    )
    pod_urn = F.concat(
        F.lit("urn:opentelemetry:kubernetes:/"),
        F.col("k8s_cluster"),
        F.lit(":"),
        F.col("k8s_namespace"),
        F.lit(":pod/"),
        F.col("k8s_pod"),
    )

    def comp(ext, type_name, name):
        return F.struct(
            ext.alias("external_id"),
            F.lit(type_name).alias("type_name"),
            name.alias("name"),
        )

    null_comp = F.lit(None).cast(
        "struct<external_id:string,type_name:string,name:string>"
    )
    candidates = F.array_compact(
        F.array(
            comp(ns_urn, "namespace", ns),
            comp(svc_urn, "service", F.col("service_name")),
            comp(inst_urn, "service-instance", inst_name),
            F.when(
                F.col("host_id").isNotNull(),
                comp(host_like, "host", F.col("host_id")),
            )
            .when(
                F.col("faas_id").isNotNull(),
                comp(host_like, "function", F.col("faas_id")),
            )
            .when(
                F.col("ecs_task_id").isNotNull(),
                comp(host_like, "task", F.col("ecs_task_id")),
            )
            .otherwise(null_comp),
            F.when(k8s_ok, comp(pod_urn, "pod", F.col("k8s_pod"))).otherwise(
                null_comp
            ),
        )
    )
    return (
        r.select(F.explode(candidates).alias("c"))
        .select("c.external_id", "c.type_name", "c.name")
        .distinct()
    )


def _host_like_urn():
    """ELIF precedence host.id > faas.id > aws.ecs.task.id
    (addHostResource, topology.go:110-165)."""
    return (
        F.when(
            F.col("host_id").isNotNull(),
            F.concat(F.lit("urn:opentelemetry:host/"), F.col("host_id")),
        )
        .when(
            F.col("faas_id").isNotNull(),
            F.concat(F.lit("urn:opentelemetry:function/"), F.col("faas_id")),
        )
        .when(
            F.col("ecs_task_id").isNotNull(),
            F.concat(F.lit("urn:opentelemetry:task/"), F.col("ecs_task_id")),
        )
    )


def derive_relations(resources: DataFrame) -> DataFrame:
    r = resources.where(F.col("service_name").isNotNull())
    ns = F.coalesce(F.col("service_namespace"), F.lit("default"))
    svc_urn = F.concat(
        F.lit("urn:opentelemetry:namespace/"), ns, F.lit(":service/"),
        F.col("service_name"),
    )
    inst_urn = F.concat(
        svc_urn, F.lit(":serviceInstance/"),
        F.coalesce(F.col("service_instance_id"), F.col("service_name")),
    )
    host_like = _host_like_urn()
    k8s_ok = (
        F.col("k8s_cluster").isNotNull()
        & F.col("k8s_namespace").isNotNull()
        & F.col("k8s_pod").isNotNull()
    )
    pod_urn = F.concat(
        F.lit("urn:opentelemetry:kubernetes:/"), F.col("k8s_cluster"),
        F.lit(":"), F.col("k8s_namespace"), F.lit(":pod/"), F.col("k8s_pod"),
    )

    def rel(src, tgt, type_name):
        return F.struct(
            F.concat(src, F.lit("-"), tgt).alias("external_id"),
            src.alias("source_identifier"),
            tgt.alias("target_identifier"),
            F.lit(type_name).alias("type_name"),
        )

    null_rel = F.lit(None).cast(
        "struct<external_id:string,source_identifier:string,"
        "target_identifier:string,type_name:string>"
    )
    candidates = F.array_compact(
        F.array(
            rel(svc_urn, inst_urn, "provided-by"),
            F.when(host_like.isNotNull(), rel(host_like, inst_urn, "executes"))
            .otherwise(null_rel),
            F.when(k8s_ok, rel(pod_urn, inst_urn, "kubernetes-to-otel"))
            .otherwise(null_rel),
        )
    )
    return (
        r.select(F.explode(candidates).alias("x"))
        .select(
            "x.external_id", "x.source_identifier", "x.target_identifier",
            "x.type_name",
        )
        .distinct()
    )


def resource_attrs_from_events(events: DataFrame) -> DataFrame:
    """Deterministic, SQL-expressible resource-attrs table derived from the
    driver's events table — exercises every cascade branch: missing
    service.name (skip), defaulted namespace/instance, host/faas/ecs ELIF,
    and the all-or-nothing k8s attr gate."""
    uid = F.col("user_id")
    eid = F.col("event_id")
    return events.select(
        F.when(eid % 11 != 0, F.concat(F.lit("svc-"), (uid % 6).cast("string")))
        .alias("service_name"),
        F.when(eid % 4 != 0, F.concat(F.lit("ns-"), (uid % 3).cast("string")))
        .alias("service_namespace"),
        F.when(eid % 3 != 0, F.concat(F.lit("inst-"), (eid % 20).cast("string")))
        .alias("service_instance_id"),
        F.when(eid % 5 < 2, F.concat(F.lit("host-"), (uid % 10).cast("string")))
        .alias("host_id"),
        F.when(eid % 5 == 2, F.concat(F.lit("fn-"), (uid % 7).cast("string")))
        .alias("faas_id"),
        F.when(eid % 5 == 3, F.concat(F.lit("task-"), (uid % 5).cast("string")))
        .alias("ecs_task_id"),
        F.when(eid % 7 < 2, F.concat(F.lit("cl-"), (uid % 2).cast("string")))
        .alias("k8s_cluster"),
        F.when(eid % 7 == 0, F.concat(F.lit("kns-"), (uid % 3).cast("string")))
        .alias("k8s_namespace"),
        F.when(eid % 7 == 0, F.concat(F.lit("pod-"), (eid % 50).cast("string")))
        .alias("k8s_pod"),
    )
