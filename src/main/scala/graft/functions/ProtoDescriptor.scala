package graft.functions

import java.nio.charset.StandardCharsets

import ProtoWire.{Reader, WField}

/** Minimal `FileDescriptorSet` reader — the `protoc -o out.desc` format
  * that `parse_proto`/`encode_proto` take as their `desc_file` argument
  * (reference `lib/codecs/src/decoding/format/protobuf.rs:74-79`,
  * cue `parse_proto.cue`).
  *
  * descriptor.proto is ITSELF a protobuf message, so this parses it with
  * the ProtoWire kernel and the descriptor.proto field numbers — which
  * are stable, public protocol (google/protobuf/descriptor.proto):
  *
  *   FileDescriptorSet.file            = 1
  *   FileDescriptorProto.package       = 2   .message_type = 4   .enum_type = 5
  *   DescriptorProto.name              = 1   .field = 2  .nested_type = 3
  *                   .enum_type        = 4   .options = 7
  *   MessageOptions.map_entry          = 7
  *   FieldDescriptorProto.name = 1  .number = 3  .label = 4  .type = 5
  *                        .type_name   = 6
  *   EnumDescriptorProto.name = 1  .value = 2
  *   EnumValueDescriptorProto.name = 1 .number = 2
  *
  * Only the subset a runtime decoder needs is modeled; everything else
  * (options, services, extensions, source info) is skipped field-wise.
  */
object ProtoDescriptor {

  // FieldDescriptorProto.Type numbers (public enum)
  val TDouble = 1; val TFloat = 2; val TInt64 = 3; val TUInt64 = 4
  val TInt32 = 5; val TFixed64 = 6; val TFixed32 = 7; val TBool = 8
  val TString = 9; val TGroup = 10; val TMessage = 11; val TBytes = 12
  val TUInt32 = 13; val TEnum = 14; val TSFixed32 = 15; val TSFixed64 = 16
  val TSInt32 = 17; val TSInt64 = 18

  val LabelRepeated = 3

  final case class FieldD(name: String, number: Int, label: Int, tpe: Int,
                          typeName: String) extends Serializable {
    def repeated: Boolean = label == LabelRepeated
  }
  final case class EnumD(fqName: String, byNumber: Map[Int, String],
                         byName: Map[String, Int]) extends Serializable
  final case class MessageD(fqName: String, fields: Seq[FieldD],
                            mapEntry: Boolean) extends Serializable

  /** Resolved registry: fully-qualified name -> message / enum. */
  final case class Registry(messages: Map[String, MessageD],
                            enums: Map[String, EnumD]) extends Serializable {
    def message(fq: String): MessageD =
      messages.getOrElse(fq.stripPrefix("."), throw new IllegalArgumentException(
        s"message type '$fq' does not exist in the descriptor file"))
    def enum(fq: String): EnumD =
      enums.getOrElse(fq.stripPrefix("."), throw new IllegalArgumentException(
        s"enum type '$fq' not found"))
  }

  private def str(b: Array[Byte]): String = new String(b, StandardCharsets.UTF_8)

  private def parseField(bytes: Array[Byte]): FieldD = {
    var name = ""; var number = 0; var label = 1; var tpe = 0; var typeName = ""
    new Reader(bytes).readAll().foreach {
      case WField(1, 2, _, b) => name = str(b)
      case WField(3, 0, v, _) => number = v.toInt
      case WField(4, 0, v, _) => label = v.toInt
      case WField(5, 0, v, _) => tpe = v.toInt
      case WField(6, 2, _, b) => typeName = str(b)
      case _ => ()
    }
    FieldD(name, number, label, tpe, typeName)
  }

  private def parseEnum(prefix: String, bytes: Array[Byte]): EnumD = {
    var name = ""
    val vals = Map.newBuilder[Int, String]
    new Reader(bytes).readAll().foreach {
      case WField(1, 2, _, b) => name = str(b)
      case WField(2, 2, _, b) =>
        var vn = ""; var num = 0
        new Reader(b).readAll().foreach {
          case WField(1, 2, _, nb) => vn = str(nb)
          case WField(2, 0, v, _)  => num = v.toInt
          case _ => ()
        }
        vals += num -> vn
      case _ => ()
    }
    val byNum = vals.result()
    EnumD(s"$prefix$name", byNum, byNum.map(_.swap))
  }

  private def parseMessage(prefix: String, bytes: Array[Byte],
                           msgs: collection.mutable.Builder[(String, MessageD), Map[String, MessageD]],
                           enums: collection.mutable.Builder[(String, EnumD), Map[String, EnumD]]): Unit = {
    var name = ""
    val fields = Seq.newBuilder[FieldD]
    val nested = Seq.newBuilder[Array[Byte]]
    val nestedEnums = Seq.newBuilder[Array[Byte]]
    var mapEntry = false
    new Reader(bytes).readAll().foreach {
      case WField(1, 2, _, b) => name = str(b)
      case WField(2, 2, _, b) => fields += parseField(b)
      case WField(3, 2, _, b) => nested += b
      case WField(4, 2, _, b) => nestedEnums += b
      case WField(7, 2, _, b) => // MessageOptions
        new Reader(b).readAll().foreach {
          case WField(7, 0, v, _) => mapEntry = v != 0L
          case _ => ()
        }
      case _ => ()
    }
    val fq = s"$prefix$name"
    msgs += fq -> MessageD(fq, fields.result(), mapEntry)
    nested.result().foreach(parseMessage(s"$fq.", _, msgs, enums))
    nestedEnums.result().foreach(b => { val e = parseEnum(s"$fq.", b); enums += e.fqName -> e })
  }

  /** Parse a serialized FileDescriptorSet into a resolved Registry. */
  def parse(descSet: Array[Byte]): Registry = {
    val msgs = Map.newBuilder[String, MessageD]
    val enums = Map.newBuilder[String, EnumD]
    new Reader(descSet).readAll().foreach {
      case WField(1, 2, _, fileBytes) =>
        var pkg = ""
        val topMsgs = Seq.newBuilder[Array[Byte]]
        val topEnums = Seq.newBuilder[Array[Byte]]
        new Reader(fileBytes).readAll().foreach {
          case WField(2, 2, _, b) => pkg = str(b)
          case WField(4, 2, _, b) => topMsgs += b
          case WField(5, 2, _, b) => topEnums += b
          case _ => ()
        }
        val prefix = if (pkg.isEmpty) "" else s"$pkg."
        topMsgs.result().foreach(parseMessage(prefix, _, msgs, enums))
        topEnums.result().foreach(b => { val e = parseEnum(prefix, b); enums += e.fqName -> e })
      case _ => ()
    }
    Registry(msgs.result(), enums.result())
  }
}
