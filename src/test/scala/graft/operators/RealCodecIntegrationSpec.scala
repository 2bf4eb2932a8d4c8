package graft.operators

import graft.{SparkSpec, Tables}

/** Deployment documentation for the RealCodecSeam, kept compiling so it
  * cannot bit-rot (r15 verdict, optional item #7): how a REAL ONNX
  * model plugs into the m02 kernel contract. The gate container ships
  * no codec/NN runtime by design (the reference stubs the identical
  * paths — covid_measures.py:253-256), so the end-to-end test is
  * `ignore`d by default and loads ONNX Runtime REFLECTIVELY: on a
  * cluster with `ai.onnxruntime:onnxruntime` (and a model file) on the
  * executor classpath, flip `ignore` to `test`, point `modelPath` at
  * the .onnx file, and the identical seam plumbing the stub gates
  * exercise (schema, cadence sampling, per-partition batching,
  * featuresBatch tensor grouping) runs real inference with NO other
  * code change — that is the claim this file checks.
  */
class RealCodecIntegrationSpec extends SparkSpec {

  /** A FrameKernel over ONNX Runtime, built the way the seam scaladoc
    * prescribes: all runtime state behind @transient lazy vals so the
    * session materializes ONCE per executor JVM on first use, never
    * serialized from the driver; reflective so this file compiles in
    * the runtime-free gate container. On the executor classpath the
    * reflection resolves to:
    *
    * {{{
    * val env = OrtEnvironment.getEnvironment()
    * val session = env.createSession(modelPath, new OrtSession.SessionOptions())
    * session.run(Map("input" -> OnnxTensor.createTensor(env, fbuf)).asJava)
    * }}}
    */
  private class OnnxFrameKernel(modelPath: String) extends FrameKernel {
    @transient private lazy val env = {
      val cls = Class.forName("ai.onnxruntime.OrtEnvironment")
      cls.getMethod("getEnvironment").invoke(null)
    }
    @transient private lazy val session = {
      val optCls = Class.forName("ai.onnxruntime.OrtSession$SessionOptions")
      env.getClass
        .getMethod("createSession", classOf[String], optCls)
        .invoke(env, modelPath, optCls.getDeclaredConstructor().newInstance()
          .asInstanceOf[Object])
    }

    // the gate frames carry the synthetic GAU/IMG payloads; a real
    // deployment swaps this for an FFI codec (JavaCPP ffmpeg / FFM) —
    // decode stays per-frame, which is what codecs are
    def decode(payload: Array[Byte]): FrameKernel.DecodedFrame =
      FrameKernel.DecodedFrame(width = 32, height = 32, pixels = payload)

    def features(frame: FrameKernel.DecodedFrame): Array[Float] =
      featuresBatch(Seq(frame)).head

    // batched inference — the seam hands WHOLE groups here so the
    // [batch, H*W] tensor dim is real, not iterator chunking
    override def featuresBatch(frames: Seq[FrameKernel.DecodedFrame]): Seq[Array[Float]] = {
      val b = frames.length
      val dim = 32 * 32
      val fbuf = Array.ofDim[Float](b, dim)
      for (i <- 0 until b; j <- 0 until dim)
        fbuf(i)(j) = (frames(i).pixels(j % frames(i).pixels.length) & 0xFF) / 255f
      val tensorCls = Class.forName("ai.onnxruntime.OnnxTensor")
      val tensor = tensorCls.getMethods
        .find(m => m.getName == "createTensor" && m.getParameterCount == 2)
        .get.invoke(null, env, fbuf)
      try {
        val result = session.getClass
          .getMethod("run", classOf[java.util.Map[_, _]])
          .invoke(session, java.util.Collections.singletonMap("input", tensor))
        val out = result.getClass.getMethod("get", classOf[Int]).invoke(result, Integer.valueOf(0))
        val value = out.getClass.getMethod("getValue").invoke(out)
          .asInstanceOf[Array[Array[Float]]]
        value.toSeq
      } finally tensorCls.getMethod("close").invoke(tensor)
    }
  }

  // `ignore` → `test` on a cluster with onnxruntime + a model file.
  ignore("m02 seam runs a real ONNX session end-to-end with no plumbing change") {
    val modelPath = sys.env.getOrElse("GRAFT_ONNX_MODEL", "/models/features.onnx")
    val events = Tables.events(spark, sfDir)
    val frames = Multimodal.syntheticFrames(events, nStreams = 2L)
    val out = RealCodecSeam.decodeAndFeaturize(
      frames, new OnnxFrameKernel(modelPath), batch = 32)
    // the same invariants the stub gate pins (MultimodalSpec): row
    // count and (stream, frame) keys survive the kernel swap, and the
    // feature column is a fixed-dim vector the ANN operators consume
    assert(out.count() == frames.count())
    val dims = out.selectExpr("size(features)").distinct().collect().map(_.getInt(0))
    assert(dims.length == 1 && dims.head > 0)
  }

  test("the ONNX kernel shape satisfies the seam contract without the runtime") {
    // compile-time half of the claim, runnable in the gate container:
    // the reflective kernel IS a FrameKernel, so the seam accepts it —
    // the swap is type-checked even where the runtime is absent.
    val k: FrameKernel = new OnnxFrameKernel("/models/features.onnx")
    assert(k.isInstanceOf[Serializable])
  }
}
