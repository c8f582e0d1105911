package graft.ml

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** F10 model INGESTION: parse a trained tree ensemble's JSON dump into
  * [[TreeNode]]s for the [[TreeScoring]] compiler.
  *
  * The accepted shape is the public XGBoost text-dump format
  * (`Booster.get_dump(dump_format="json")`): one JSON object per tree,
  * each node either a leaf
  * `{"nodeid": n, "leaf": v}` or a split
  * `{"nodeid": n, "split": "f0", "split_condition": t, "yes": a,
  * "no": b, "missing": a|b, "children": [...]}` where `yes` is taken when
  * `feature < split_condition` and `missing` names the child that receives
  * NULL/absent features. A dump is either a top-level ARRAY of tree roots
  * (exactly what `get_dump` returns, concatenated into a JSON array) or an
  * object `{"bias": b, "trees": [...]}` for ensembles with a base score.
  *
  * This replaces the reference's row-at-a-time scoring of compiled H2O
  * POJOs (common/utility/scoringFunctions.scala:24-49) with a parse-once,
  * compile-to-Catalyst path: the ingested model scores inside whole-stage
  * codegen with no model runtime on the executors.
  */
object ModelIngest {

  /** A parsed ensemble: sum of tree outputs + bias. */
  case class Ensemble(trees: Seq[TreeNode], bias: Double) {
    /** Score `df` via [[TreeScoring.scoreEnsemble]]. */
    def score(df: org.apache.spark.sql.DataFrame,
        outCol: String = "score"): org.apache.spark.sql.DataFrame =
      TreeScoring.scoreEnsemble(df, trees, bias, outCol)
    /** The oracle SQL expression for the score column. */
    def scoreSql: String = TreeScoring.scoreEnsembleSql(trees, bias)
  }

  private val mapper = new ObjectMapper()

  /** Parse a JSON tree dump. `featureNames` optionally maps dump feature
    * ids (XGBoost's `f0`, `f1`, …) to real column names; ids without a
    * mapping are used verbatim. */
  def parseEnsemble(json: String,
      featureNames: Map[String, String] = Map.empty): Ensemble = {
    val root = mapper.readTree(json)
    if (root == null)
      throw new IllegalArgumentException("empty model dump")
    if (root.isArray)
      Ensemble(root.elements().asScala.toSeq.map(parseTree(_, featureNames)), 0.0)
    else if (root.isObject && root.has("trees")) {
      val bias = if (root.has("bias")) root.get("bias").asDouble() else 0.0
      val trees = root.get("trees")
      require(trees.isArray, "\"trees\" must be a JSON array of tree roots")
      Ensemble(trees.elements().asScala.toSeq.map(parseTree(_, featureNames)),
        bias)
    } else if (root.isObject)
      // a bare single-tree dump
      Ensemble(Seq(parseTree(root, featureNames)), 0.0)
    else
      throw new IllegalArgumentException(
        s"model dump must be a tree object or array of trees, got: ${root.getNodeType}")
  }

  /** Parse one tree (an XGBoost-dump node object) into a [[TreeNode]]. */
  def parseTree(node: JsonNode,
      featureNames: Map[String, String] = Map.empty): TreeNode = {
    if (node.has("leaf")) Leaf(node.get("leaf").asDouble())
    else {
      for (k <- Seq("split", "split_condition", "yes", "no", "children"))
        require(node.has(k),
          s"split node ${node.get("nodeid")} is missing \"$k\"")
      val feat = node.get("split").asText()
      val thr = node.get("split_condition").asDouble()
      val yesId = node.get("yes").asLong()
      val noId = node.get("no").asLong()
      // XGBoost always writes "missing"; default to the no-branch (NULL
      // goes right) when absent, matching Split's own default.
      val missId = if (node.has("missing")) node.get("missing").asLong() else noId
      val kids = node.get("children").elements().asScala.toSeq
        .map(c => c.get("nodeid").asLong() -> c).toMap
      def child(id: Long): TreeNode = parseTree(
        kids.getOrElse(id, throw new IllegalArgumentException(
          s"node ${node.get("nodeid")}: child $id not in \"children\"")),
        featureNames)
      require(missId == yesId || missId == noId,
        s"node ${node.get("nodeid")}: missing=$missId is neither yes=$yesId nor no=$noId")
      // yes-branch (feature < split_condition) is the left child; NULLs
      // follow the missing branch.
      Split(featureNames.getOrElse(feat, feat), thr,
        left = child(yesId), right = child(noId),
        missingLeft = missId == yesId, strict = true)
    }
  }
}
