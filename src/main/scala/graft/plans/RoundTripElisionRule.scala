package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, JsonToStructs, Literal, StructsToJson, StructsToXml, XmlToStructs}
import org.apache.spark.sql.catalyst.expressions.json.StructsToJsonEvaluator
import org.apache.spark.sql.catalyst.expressions.objects.Invoke
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Opt-in optimizer rule: `from_xml(to_xml(x), schema)` and
  * `from_json(to_json(x), schema)` — the shapes an ETL handoff leaves
  * behind when a producer renders rows to a wire format and the consumer
  * immediately parses them back in the same plan — are pure
  * serialize/parse round trips. When the parse schema provably matches
  * the rendered struct and every field's type round-trips the codec's
  * text EXACTLY, the pair is semantics-free and this rule elides it to a
  * cast of the original struct, turning two per-row string codecs (both
  * CodegenFallback — they break the scan stage's whole-stage-codegen
  * span) into a no-op projection. Spark's own OptimizeJsonExprs prunes
  * schemas and pushes field extraction but does NOT elide the full
  * round trip (probed on 4.1: the pair survives optimization), so this
  * closes the gap for both codecs.
  *
  * Soundness gates, all required (the rule must be invisible to results):
  *   - both codec option maps empty — a non-default option (custom null
  *     value, timestamp format, ignoreSurroundingSpaces=false…) changes
  *     the text contract, so the pair stops being a provable identity;
  *   - field NAMES equal case-sensitively and in the same order, field
  *     TYPES equal exactly (the cast added below is then shape-identity,
  *     existing only to pin the original expression's field nullability);
  *   - every field type round-trips the SPECIFIC codec's text exactly:
  *     integral and boolean for both (digit strings / true / false);
  *     strings additionally for JSON, which escapes them losslessly —
  *     but NOT for XML, whose surrounding-whitespace trimming is codec
  *     semantics (pinned in the string-fidelity spec); floats/doubles
  *     for neither (NaN/Infinity rendering is not provably invertible),
  *     dates/timestamps for neither (format- and zone-dependent). A NULL
  *     field round-trips in both codecs — the generators omit the
  *     element/key, the parsers read the absence as null — pinned in
  *     ExtensionSpec.
  *
  * Gated on `spark.graft.codec.elide` (default off), same stance as the
  * LSH rewrite: the declarative plan states intent, the config opts into
  * the rewrite. Expression-level, so it fires under Project, Filter,
  * Aggregate — anywhere a codec pair appears.
  */
object RoundTripElisionRule extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    conf.getConfString("spark.graft.codec.elide", "false").toBoolean

  private val bothCodecs: Set[DataType] =
    Set(ByteType, ShortType, IntegerType, LongType, BooleanType)

  private def elidable(target: StructType, source: DataType,
      extraExact: Set[DataType]): Boolean = source match {
    case st: StructType =>
      st.length == target.length &&
        st.fields.zip(target.fields).forall { case (s, t) =>
          s.name == t.name && s.dataType == t.dataType &&
            (bothCodecs.contains(s.dataType) ||
              extraExact.contains(s.dataType))
        }
    case _ => false
  }

  private def elide(child: Expression, schema: StructType): Expression =
    // cast, not bare child: field types are equal so this is a no-op
    // projection, but it pins the ORIGINAL expression's dataType
    // (the parsers declare nullable fields; the struct's may be tighter)
    Cast(child, schema)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformAllExpressions {
      case XmlToStructs(schema: StructType, o1, StructsToXml(o2, child, _), _)
          if o1.isEmpty && o2.isEmpty &&
            elidable(schema, child.dataType, Set.empty) =>
        elide(child, schema)
      case JsonToStructs(schema: StructType, o1, inner, _)
          if o1.isEmpty && jsonRenderedChild(inner)
            .exists(c => elidable(schema, c.dataType, Set(StringType))) =>
        elide(jsonRenderedChild(inner).get, schema)
    }
  }

  /** The struct being rendered to JSON, through either spelling: the raw
    * [[StructsToJson]] expression, or the `Invoke(StructsToJsonEvaluator,
    * "evaluate", struct)` form Spark's early optimizer batches replace it
    * with (RuntimeReplaceable landing before any user-injected rule runs
    * — the XML pair is not runtime-replaced, so only JSON needs this).
    * None when options are non-empty or the shape is anything else.
    */
  private def jsonRenderedChild(e: Expression): Option[Expression] = e match {
    case StructsToJson(opts, child, _) if opts.isEmpty => Some(child)
    case i: Invoke if i.functionName == "evaluate" &&
        i.arguments.length == 1 =>
      i.targetObject match {
        case Literal(ev: StructsToJsonEvaluator, _) if ev.options.isEmpty =>
          Some(i.arguments.head)
        case _ => None
      }
    case _ => None
  }
}
