package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Cast, StructsToXml, XmlToStructs}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Opt-in optimizer rule: `from_xml(to_xml(x), schema)` — the shape an
  * ETL handoff leaves behind when a producer renders rows to XML and the
  * consumer immediately parses them back in the same plan — is a pure
  * serialize/parse round trip. When the parse schema provably matches the
  * rendered struct and every field's type round-trips XML text EXACTLY,
  * the codec pair is semantics-free and this rule elides it to a cast of
  * the original struct, turning two per-row string codecs (both
  * CodegenFallback — they break the scan stage's whole-stage-codegen
  * span) into a no-op projection.
  *
  * Soundness gates, all required (the rule must be invisible to results):
  *   - both codec option maps empty — a non-default option (custom null
  *     value, timestamp format, ignoreSurroundingSpaces=false…) changes
  *     the text contract, so the pair stops being a provable identity;
  *   - field NAMES equal case-sensitively and in the same order, field
  *     TYPES equal exactly (the cast added below is then shape-identity,
  *     existing only to pin the original expression's field nullability);
  *   - every field type is integral or boolean: those render as digit
  *     strings / true / false, immune to the XML text edges the string
  *     fidelity spec pins (surrounding-whitespace trimming) and to
  *     float formatting (NaN/Infinity never round-trip provably). A NULL
  *     field round-trips too — to_xml omits the element, from_xml reads
  *     the missing element as null — pinned in EngineSpec.
  *
  * Gated on `spark.graft.xml.elide` (default off), same stance as the
  * LSH rewrite: the declarative plan states intent, the config opts into
  * the rewrite. Expression-level, so it fires under Project, Filter,
  * Aggregate — anywhere the codec pair appears.
  */
object XmlElisionRule extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    conf.getConfString("spark.graft.xml.elide", "false").toBoolean

  private val exactTypes: Set[DataType] =
    Set(ByteType, ShortType, IntegerType, LongType, BooleanType)

  private def elidable(target: StructType, source: DataType): Boolean =
    source match {
      case st: StructType =>
        st.length == target.length &&
          st.fields.zip(target.fields).forall { case (s, t) =>
            s.name == t.name && s.dataType == t.dataType &&
              exactTypes.contains(s.dataType)
          }
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformAllExpressions {
      case XmlToStructs(schema: StructType, o1, StructsToXml(o2, child, _), _)
          if o1.isEmpty && o2.isEmpty && elidable(schema, child.dataType) =>
        // cast, not bare child: field types are equal so this is a no-op
        // projection, but it pins the ORIGINAL expression's dataType
        // (from_xml declares nullable fields; the struct's may be tighter)
        Cast(child, schema)
    }
  }
}
