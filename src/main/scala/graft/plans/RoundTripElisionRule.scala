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
  * the rendered struct and every leaf type round-trips the codec's
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
  *   - field NAMES equal case-sensitively and in the same order at every
  *     nesting level, leaf TYPES equal exactly. Field NULLABILITY is NOT
  *     required to match: the parsers declare their output as the parse
  *     schema with every level forced nullable (`schema.asNullable`), so
  *     the replacement cast targets that same all-nullable shape — which
  *     both preserves the replaced expression's dataType exactly and
  *     keeps the cast resolvable when a user hands a NOT NULL parse
  *     schema over a nullable source (nullable→non-nullable is not a
  *     valid struct cast; nullable→nullable always is);
  *   - every LEAF type round-trips the SPECIFIC codec's text exactly:
  *     integral and boolean for both (digit strings / true / false);
  *     strings additionally for JSON, which escapes them losslessly
  *     PROVIDED the value is well-formed UTF-8 — a string smuggling
  *     invalid bytes / unpaired surrogates is normalized to U+FFFD by
  *     the executed writer while the elided cast preserves the original
  *     bytes, so the elision assumes (and documents) well-formed string
  *     data, the same assumption every text sink in this engine makes —
  *     but NOT strings for XML, whose surrounding-whitespace trimming is
  *     codec semantics (pinned in the string-fidelity spec);
  *     floats/doubles for neither (NaN/Infinity rendering is not
  *     provably invertible), dates/timestamps for neither (format- and
  *     zone-dependent). A NULL field round-trips in both codecs — the
  *     generators omit the element/key, the parsers read the absence as
  *     null — pinned in ExtensionSpec;
  *   - NESTED STRUCTS recurse for both codecs: a missing element/key
  *     parses as a null struct, and — probed on 4.1 and pinned in
  *     ExtensionSpec — an all-null-fields struct renders as an EMPTY
  *     element/object (`<c/>` / `{}`) and parses back as a non-null
  *     struct of nulls, so the null/empty distinction survives;
  *   - ARRAYS recurse for JSON ONLY: `[]`, null, and null elements all
  *     round-trip JSON text exactly. XML's repeated-element encoding is
  *     LOSSY (probed on 4.1): an empty array renders as nothing and
  *     parses back as NULL, and null elements are silently dropped — so
  *     any ArrayType anywhere in the schema fences the XML elision;
  *   - MAPS recurse for JSON ONLY, and only with STRING keys (r16,
  *     probed on 4.1): a string-keyed map IS a JSON object — `{}`, a
  *     null map, null values, and struct values (incl. null structs)
  *     all round-trip exactly, with keys riding the same well-formed-
  *     UTF-8 escaping assumption as string leaves. Non-string keys need
  *     no fence of their own: `from_json` REJECTS any non-string map
  *     key at analysis time (INVALID_JSON_MAP_KEY_TYPE), so such a pair
  *     can never reach the optimizer. MapType anywhere fences XML (the
  *     XML generator has no array/map encoding to prove anything
  *     about).
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

  /** Recursive gate: does `source` provably round-trip the codec's text
    * as `target`? Structs recurse field-by-field (names in order, any
    * nullability — see the cast-target note above); arrays and
    * string-keyed maps recurse only where the codec's container
    * encoding is lossless (`jsonContainers` — JSON's `[]`/`{}` are;
    * XML's repeated/absent elements aren't); leaves require exact type
    * equality AND membership in the codec's exact-round-trip set.
    */
  private def elidable(target: DataType, source: DataType,
      extraExact: Set[DataType], jsonContainers: Boolean): Boolean =
    (target, source) match {
      case (t: StructType, s: StructType) =>
        s.length == t.length &&
          s.fields.zip(t.fields).forall { case (sf, tf) =>
            sf.name == tf.name &&
              elidable(tf.dataType, sf.dataType, extraExact, jsonContainers)
          }
      case (ArrayType(te, _), ArrayType(se, _)) if jsonContainers =>
        elidable(te, se, extraExact, jsonContainers)
      case (MapType(tk, tv, _), MapType(sk, sv, _))
          if jsonContainers && tk == StringType && sk == StringType =>
        elidable(tv, sv, extraExact, jsonContainers)
      case (t, s) =>
        t == s && (bothCodecs.contains(s) || extraExact.contains(s))
    }

  /** The parse schema with every level forced nullable — what the
    * parsers declare as their output type (`schema.asNullable` is
    * private[spark]; this is the same recursion).
    */
  private def nullably(dt: DataType): DataType = dt match {
    case st: StructType => StructType(st.fields.map(f =>
      f.copy(dataType = nullably(f.dataType), nullable = true)))
    case ArrayType(et, _) => ArrayType(nullably(et), containsNull = true)
    case MapType(kt, vt, _) =>
      MapType(nullably(kt), nullably(vt), valueContainsNull = true)
    case other => other
  }

  private def elide(child: Expression, schema: DataType): Expression =
    // cast to the PARSERS' declared output type (schema with every level
    // nullable), not the bare child and not the raw parse schema: leaf
    // types are equal so the cast is a no-op projection, but targeting
    // the all-nullable shape preserves the replaced expression's exact
    // dataType and stays a valid struct cast even when the user's parse
    // schema is tighter (non-nullable) than the source
    Cast(child, nullably(schema))

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformAllExpressions {
      case XmlToStructs(schema: StructType, o1, StructsToXml(o2, child, _), _)
          if o1.isEmpty && o2.isEmpty &&
            elidable(schema, child.dataType, Set.empty, jsonContainers = false) =>
        elide(child, schema)
      // the JSON parse schema may be a struct, a string-keyed map, or an
      // array at TOP level too (from_json accepts all three) — elidable
      // recurses over whichever shape arrives
      case JsonToStructs(schema, o1, inner, _)
          if o1.isEmpty && jsonRenderedChild(inner)
            .exists(c => elidable(schema, c.dataType, Set(StringType),
              jsonContainers = true)) =>
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
