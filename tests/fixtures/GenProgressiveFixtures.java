// Regenerates jpeg_progressive{,_gray}.{jpg,rgb}: Java ImageIO progressive
// (MODE_DEFAULT = libjpeg's standard 10-scan script), with ImageIO's own
// decode dumped as the reference pixels (.rgb = >HH h,w header + samples).
// javac GenProgressiveFixtures.java && java GenProgressiveFixtures <fixdir>
import javax.imageio.*;
import javax.imageio.stream.*;
import java.awt.image.BufferedImage;
import java.io.*;
import java.util.Iterator;

public class GenProgressiveFixtures {
    public static void main(String[] args) throws Exception {
        int w = 100, h = 84;
        BufferedImage img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB);
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++) {
                int r = Math.min(255, (int)(x * 2.55));
                int g = Math.min(255, (int)(y * 3.03));
                int b = Math.min(255, (int)((x + y) * 1.38));
                img.setRGB(x, y, (r << 16) | (g << 8) | b);
            }
        writeProg(img, args[0] + "/jpeg_progressive.jpg");
        BufferedImage gray = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY);
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++)
                gray.getRaster().setSample(x, y, 0, Math.min(255, (int)(x*1.3 + y*1.7)));
        writeProg(gray, args[0] + "/jpeg_progressive_gray.jpg");
        dump(args[0] + "/jpeg_progressive.jpg", args[0] + "/jpeg_progressive.rgb", 3);
        dump(args[0] + "/jpeg_progressive_gray.jpg", args[0] + "/jpeg_progressive_gray.rgb", 1);
        System.out.println("DONE");
    }
    static void writeProg(BufferedImage img, String path) throws Exception {
        Iterator<ImageWriter> it = ImageIO.getImageWritersByFormatName("jpeg");
        ImageWriter wr = it.next();
        ImageWriteParam p = wr.getDefaultWriteParam();
        p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT);
        p.setCompressionQuality(0.85f);
        p.setProgressiveMode(ImageWriteParam.MODE_DEFAULT);
        ImageOutputStream os = ImageIO.createImageOutputStream(new File(path));
        wr.setOutput(os);
        wr.write(null, new IIOImage(img, null, null), p);
        os.close(); wr.dispose();
    }
    static void dump(String in, String out, int ch) throws Exception {
        BufferedImage d = ImageIO.read(new File(in));
        int w = d.getWidth(), h = d.getHeight();
        DataOutputStream fo = new DataOutputStream(new FileOutputStream(out));
        fo.writeShort(h); fo.writeShort(w);
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++) {
                if (ch == 3) {
                    int p = d.getRGB(x, y);
                    fo.write((p >> 16) & 0xFF); fo.write((p >> 8) & 0xFF); fo.write(p & 0xFF);
                } else fo.write(d.getRaster().getSample(x, y, 0));
            }
        fo.close();
    }
}
