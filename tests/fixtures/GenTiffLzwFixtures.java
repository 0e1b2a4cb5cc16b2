import javax.imageio.*;
import javax.imageio.stream.*;
import java.awt.image.*;
import java.io.*;
import java.util.Iterator;

// Two modes:
//   write <out.tif> <w> <h> <compression>  - deterministic RGB ramp, strip layout
//   read  <in.tif> <out.rgb>               - decode to raw interleaved RGB(A) bytes
public class GenTiffLzwFixtures {
  public static void main(String[] a) throws Exception {
    if (a[0].equals("write")) {
      int w = Integer.parseInt(a[2]), h = Integer.parseInt(a[3]);
      BufferedImage img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR);
      for (int y = 0; y < h; y++)
        for (int x = 0; x < w; x++) {
          int r = (x * 7 + y * 3) & 0xFF, g = (x ^ y) & 0xFF, b = (x + 2 * y) & 0xFF;
          if (x > w / 2 && y > h / 2) { r = 200; g = 10; b = 10; } // flat region (runs)
          img.setRGB(x, y, (r << 16) | (g << 8) | b);
        }
      Iterator<ImageWriter> it = ImageIO.getImageWritersByFormatName("TIFF");
      ImageWriter wr = it.next();
      ImageWriteParam p = wr.getDefaultWriteParam();
      p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT);
      p.setCompressionType(a[4]);
      try (ImageOutputStream os = ImageIO.createImageOutputStream(new File(a[1]))) {
        wr.setOutput(os);
        wr.write(null, new IIOImage(img, null, null), p);
      }
      System.out.println("wrote " + a[1]);
    } else {
      BufferedImage img = ImageIO.read(new File(a[1]));
      int w = img.getWidth(), h = img.getHeight();
      DataOutputStream os = new DataOutputStream(new FileOutputStream(a[2]));
      for (int y = 0; y < h; y++)
        for (int x = 0; x < w; x++) {
          int v = img.getRGB(x, y);
          os.writeByte((v >> 16) & 0xFF);
          os.writeByte((v >> 8) & 0xFF);
          os.writeByte(v & 0xFF);
          os.writeByte((v >> 24) & 0xFF); // alpha last, matching band order R,G,B,A
        }
      os.close();
      System.out.println("read " + w + "x" + h);
    }
  }
}
